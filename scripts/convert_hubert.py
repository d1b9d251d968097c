"""Convert a torch HuBERT checkpoint to flax safetensors for AdaptiveHubert.

The reference's hubert/CFM stages consume ``dr87/spinv2_rvc`` (reference
train/models/ssl.py:16-31).  Usage (``--model`` may be a local directory):

    python scripts/convert_hubert.py --model <name-or-dir> \
        --out hubert_flax.safetensors

Then set ``hubert.weights_path: hubert_flax.safetensors`` in model.yml.
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF model name or local checkpoint directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", type=int, default=None,
                    help="encoder layers to keep (default: all)")
    args = ap.parse_args()

    from safetensors.numpy import save_file
    from transformers import HubertModel

    from stylish_tts_tpu.models.slm_convert import convert_hubert_model

    model = HubertModel.from_pretrained(args.model)
    model.eval()
    flat = convert_hubert_model(model, n_layers=args.layers)
    save_file(flat, args.out)
    print(f"wrote {len(flat)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
