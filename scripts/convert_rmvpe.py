#!/usr/bin/env python
"""Convert the published RMVPE pitch-model checkpoint to flax weights.

The reference downloads ``rmvpe.safetensors`` (torch E2E0 state_dict) from
HF hub at runtime (train/dataprep/pitch_extractor.py:51-53); this converts
it once, offline, into the params+batch_stats safetensors consumed by
``stylish-train-tpu pitch --method rmvpe --rmvpe-weights out.safetensors``.

Usage: python scripts/convert_rmvpe.py rmvpe.safetensors out.safetensors
"""

import sys

import numpy as np


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

    from stylish_tts_tpu.export.import_torch import BATCH_STATS_PREFIX
    from stylish_tts_tpu.models.torch_convert import convert_rmvpe

    params, stats = convert_rmvpe(sd)
    flat = dict(params)
    for k, v in stats.items():
        flat[BATCH_STATS_PREFIX + k] = np.atleast_1d(np.asarray(v))
    save_file(flat, dst)
    print(f"wrote {dst} ({len(params)} params, {len(stats)} batch stats)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
