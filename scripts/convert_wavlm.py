"""Convert a torch WavLM checkpoint to flax safetensors for the slm loss.

Usage (offline-friendly: --model may be a local checkpoint directory):

    python scripts/convert_wavlm.py --model microsoft/wavlm-base-plus \
        --out wavlm_flax.safetensors

Then set ``slm.weights_path: wavlm_flax.safetensors`` in model.yml.
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="microsoft/wavlm-base-plus",
                    help="HF model name or local checkpoint directory")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from safetensors.numpy import save_file
    from transformers import WavLMModel

    from stylish_tts_tpu.models.slm_convert import convert_wavlm_model

    model = WavLMModel.from_pretrained(args.model)
    model.eval()
    flat = convert_wavlm_model(model)
    save_file(flat, args.out)
    print(f"wrote {len(flat)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
