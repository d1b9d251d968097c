#!/usr/bin/env python
"""Convert the wespeaker vblinkp speaker checkpoint to flax weights.

The reference loads wespeaker "vblinkp" (voxblink2 SimAM-ResNet34) at
runtime and strips its bottleneck so the hubert/CFM stages condition on the
10240-d pre-bottleneck embedding (train/models/ssl.py:34-67).  This
converts the torch checkpoint once, offline, into the safetensors consumed
via model config `speaker_embedder.weights_path`.

Usage: python scripts/convert_wespeaker.py avg_model.pt out.safetensors
       (accepts a raw state_dict .pt, a wespeaker checkpoint dict with a
       'model'/'state_dict' key, or a .safetensors export)
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
    else:
        import torch

        sd = torch.load(src, map_location="cpu", weights_only=True)
        for key in ("model", "state_dict"):
            if isinstance(sd, dict) and key in sd and hasattr(
                sd[key], "items"
            ):
                sd = sd[key]
        sd = {k: v.numpy() for k, v in sd.items()}

    from safetensors.numpy import save_file

    from stylish_tts_tpu.models.torch_convert import convert_wespeaker

    params = convert_wespeaker(sd)
    save_file(params, dst)
    print(f"wrote {dst} ({len(params)} params)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
