"""Assemble SCALING_r05.json: the r4 modeled ICI/DCN projections plus the
r5 MEASURED multi-process rows (scripts/scaling_multiproc.py).

Usage: python scripts/make_scaling_artifact.py MEASURED.json [--base SCALING_r04.json]
       [--out SCALING_r05.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("measured")
    ap.add_argument("--base", default="SCALING_r04.json")
    ap.add_argument("--out", default="SCALING_r05.json")
    args = ap.parse_args()

    base = json.loads(Path(args.base).read_text())
    measured = json.loads(Path(args.measured).read_text())
    base["measured_multihost"] = measured
    base["note"] = (
        "MEASURED: (a) measured_multihost — the production acoustic train "
        "step run by 1/2/4 REAL OS processes (one CPU device each, "
        "jax.distributed multi-controller, cross-process grad-allreduce "
        "through GSPMD/Gloo; weak scaling, per-process batch fixed); CPU "
        "devices measure the multi-process collective/runtime path, not "
        "TPU compute.  (b) the virtual-CPU curve (bounds host-core "
        "contention only).  MODELED (projections — no multi-chip/multi-"
        "host hardware in this environment): modeled_ici_efficiency = "
        "ring all-reduce over v5e ICI within a slice; "
        "modeled_dcn_efficiency_hosts = DP across single-host slices "
        "over 100 Gbps DCN."
    )
    Path(args.out).write_text(json.dumps(base, indent=1))
    print(json.dumps({
        "out": args.out,
        "measured_rows": measured.get("rows"),
    }))


if __name__ == "__main__":
    main()
