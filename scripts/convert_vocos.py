#!/usr/bin/env python
"""Convert the pretrained Vocos mel-vocoder checkpoint to flax weights.

The reference loads charactr/vocos-mel-24khz at runtime via
Vocos.from_pretrained (train/train_context.py:179-183) to decode CFM
validation mels; this converts its state_dict once, offline, into the
safetensors consumed by the ``cfm_hubert_mel`` validation branch
(``--vocos-weights`` / config ``training.vocos_weights``).

Usage: python scripts/convert_vocos.py pytorch_model.bin out.safetensors
       (also accepts a .safetensors export of the same state_dict)
"""

import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    src, dst = sys.argv[1], sys.argv[2]
    if src.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(src)
    else:  # torch .pt/.bin
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(
                src, map_location="cpu", weights_only=True
            ).items()
        }

    from safetensors.numpy import save_file

    from stylish_tts_tpu.models.torch_convert import convert_vocos

    params = convert_vocos(sd)
    save_file(params, dst)
    print(f"wrote {dst} ({len(params)} params)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
