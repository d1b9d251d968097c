"""Probe which VMEM patch-assembly idioms Mosaic compiles on this TPU.

The round-3 fused MRD kernel (ops/spec_conv.py) died on a
`tpu.concatenate` offset mismatch in its stride-2 window gather.  Before
rewriting it (VERDICT r4 #2), compile each candidate assembly idiom in
isolation:

  concat_full_lane : jnp.concatenate of [T,32] slices taken at static
                     SUBLANE offsets only (the stride-1 pattern)
  concat_lane_off  : concatenate of slices at 32-lane offsets (the
                     stride-2 pairing pattern that failed in r3)
  scratch_write    : assemble P by writing slices into a VMEM scratch at
                     static 32-lane column offsets
  stack_reshape    : jnp.stack(..., axis) + reshape merge
  dma_assemble     : VMEM->VMEM async copies into the P scratch

Each probe compiles AND runs one tiny case, checking numerics vs XLA.
Usage: python scripts/mosaic_probe.py [--probe all]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, CIN, TAPS = 256, 32, 6  # tile rows, channels, slices to assemble


def ref_patches(x):
    # x: [T + TAPS, CIN] -> P [T, TAPS*CIN], col j = x[j + 0:T]
    return np.concatenate([x[j:j + T] for j in range(TAPS)], axis=1)


def _mk(x):
    return jnp.asarray(x)


def probe_concat_full_lane(x):
    def kern(x_ref, o_ref):
        cols = [x_ref[j:j + T, :] for j in range(TAPS)]
        o_ref[:] = jnp.concatenate(cols, axis=1)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, TAPS * CIN), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_concat_lane_off(x):
    # slices at 32-lane offsets from a [T+TAPS, 2*CIN] paired layout
    xp = jnp.concatenate([x, x * 2.0], axis=1)  # [T+TAPS, 64]

    def kern(x_ref, o_ref):
        cols = []
        for j in range(TAPS):
            off = (j % 2) * CIN
            cols.append(x_ref[j:j + T, off:off + CIN])
        o_ref[:] = jnp.concatenate(cols, axis=1)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, TAPS * CIN), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xp)


def probe_scratch_write(x):
    def kern(x_ref, o_ref, p_ref):
        for j in range(TAPS):
            p_ref[:, j * CIN:(j + 1) * CIN] = x_ref[j:j + T, :]
        o_ref[:] = p_ref[:]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, TAPS * CIN), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, TAPS * CIN), x.dtype)],
    )(x)


def probe_stack_reshape(x):
    def kern(x_ref, o_ref):
        cols = [x_ref[j:j + T, :] for j in range(TAPS)]
        stacked = jnp.stack(cols, axis=1)  # [T, TAPS, CIN]
        o_ref[:] = stacked.reshape(T, TAPS * CIN)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, TAPS * CIN), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_dma_assemble(x):
    def kern(x_ref, o_ref, p_ref, sem):
        copies = []
        for j in range(TAPS):
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(j, T), :],
                p_ref.at[:, pl.ds(j * CIN, CIN)],
                sem.at[j],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()
        o_ref[:] = p_ref[:]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, TAPS * CIN), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T, TAPS * CIN), x.dtype),
            pltpu.SemaphoreType.DMA((TAPS,)),
        ],
    )(x)


def probe_matmul_after_concat(x):
    # the full pattern: assemble then [T, K] @ [K, 128]
    K = TAPS * CIN
    w = jnp.asarray(
        np.random.default_rng(0).standard_normal((K, 128)), jnp.float32
    )

    def kern(x_ref, w_ref, o_ref):
        cols = [x_ref[j:j + T, :] for j in range(TAPS)]
        p = jnp.concatenate(cols, axis=1)
        o_ref[:] = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)

    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)
    return y, w


PROBES = [
    "concat_full_lane", "concat_lane_off", "scratch_write",
    "stack_reshape", "dma_assemble", "matmul_after_concat",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="all")
    args = ap.parse_args()
    names = PROBES if args.probe == "all" else args.probe.split(",")

    rng = np.random.default_rng(0)
    xh = rng.standard_normal((T + TAPS, CIN)).astype(np.float32)
    want = ref_patches(xh)
    x = _mk(xh)

    results = {}
    for name in names:
        fn = globals()[f"probe_{name}"]
        try:
            if name == "matmul_after_concat":
                y, w = fn(x)
                ok = bool(np.allclose(np.asarray(y), want @ np.asarray(w),
                                      atol=1e-3))
            elif name == "concat_lane_off":
                y = fn(x)
                got = np.asarray(y)
                exp = np.concatenate(
                    [xh[j:j + T] * (1.0 + (j % 2)) for j in range(TAPS)],
                    axis=1,
                )
                ok = bool(np.allclose(got, exp, atol=1e-5))
            else:
                y = fn(x)
                ok = bool(np.allclose(np.asarray(y), want, atol=1e-5))
            results[name] = "ok" if ok else "WRONG_NUMERICS"
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).splitlines()
            results[name] = "FAIL: " + (msg[0][:160] if msg else repr(exc))
            traceback.print_exc(limit=2, file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
