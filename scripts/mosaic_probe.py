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


def probe_matmul_after_scratch(x):
    # assemble via scratch writes, then matmul
    K = TAPS * CIN
    w = jnp.asarray(
        np.random.default_rng(0).standard_normal((K, 128)), jnp.float32
    )

    def kern(x_ref, w_ref, o_ref, p_ref):
        for j in range(TAPS):
            p_ref[:, j * CIN:(j + 1) * CIN] = x_ref[j:j + T, :]
        o_ref[:] = jnp.dot(
            p_ref[:], w_ref[:], preferred_element_type=jnp.float32
        )

    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, TAPS * CIN), jnp.float32)],
    )(x, w)
    return y, w


def probe_mini_kernel(x):
    """Miniature of the packed spec-conv fwd: grid, manual DMA from an
    ANY-space input at grid-linear offsets into a 3D VMEM scratch, 54
    lane-offset slice concat, matmul, 4D output block store."""
    del x
    B, FQ, TB = 2, 3, 2
    WIN = T + 8
    KT = 9
    K = 6 * KT * CIN
    rng = np.random.default_rng(1)
    xq = rng.standard_normal((B, FQ + 2, TB * T + 8, 128)).astype(np.float32)
    w = rng.standard_normal((K, 128)).astype(np.float32) * 0.1

    def kern(x_hbm, w_ref, o_ref, xt, sem):
        b = pl.program_id(0)
        fq = pl.program_id(1)
        tb = pl.program_id(2)
        cps = []
        for dfq in range(3):
            cp = pltpu.make_async_copy(
                x_hbm.at[b, fq + dfq, pl.ds(tb * T, WIN), :],
                xt.at[dfq],
                sem.at[dfq],
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        cols = []
        for g in range(3, 9):
            blk, lane = divmod(g, 4)
            for dt in range(KT):
                cols.append(
                    xt[blk, dt:dt + T, lane * CIN:(lane + 1) * CIN]
                )
        p = jnp.concatenate(cols, axis=1)
        acc = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[0, 0] = acc

    y = pl.pallas_call(
        kern,
        grid=(B, FQ, TB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, T, 128), lambda b, fq, tb: (b, fq, tb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, FQ, TB * T, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, WIN, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(jnp.asarray(xq), jnp.asarray(w))
    got = np.asarray(y)

    # numpy reference
    want = np.zeros_like(got)
    for b in range(B):
        for fq in range(FQ):
            for tb in range(TB):
                cols = []
                for g in range(3, 9):
                    blk, lane = divmod(g, 4)
                    tile = xq[b, fq + blk, tb * T:tb * T + WIN, :]
                    for dt in range(KT):
                        cols.append(
                            tile[dt:dt + T, lane * CIN:(lane + 1) * CIN]
                        )
                p = np.concatenate(cols, axis=1)
                want[b, fq, tb * T:(tb + 1) * T] = p @ w
    err = float(np.max(np.abs(got - want)))
    scale = float(np.max(np.abs(want))) + 1e-9
    sys.stderr.write(f"mini_kernel rel err {err / scale:.3g}\n")
    return "ok" if err / scale < 2e-2 else f"WRONG_NUMERICS({err / scale:.3g})"


PROBES = [
    "concat_full_lane", "concat_lane_off", "scratch_write",
    "stack_reshape", "dma_assemble", "matmul_after_concat",
    "matmul_after_scratch", "mini_kernel",
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
            if name == "mini_kernel":
                results[name] = fn(x)
                continue
            if name.startswith("matmul_after"):
                y, w = fn(x)
                got = np.asarray(y)
                exp = want @ np.asarray(w)
                d = np.abs(got - exp)
                ok = bool(np.allclose(got, exp, atol=1e-3))
                if not ok:
                    bad_r = np.where(d.max(1) > 1e-3)[0]
                    bad_c = np.where(d.max(0) > 1e-3)[0]
                    sys.stderr.write(
                        f"{name}: max={d.max():.3g} rows "
                        f"{bad_r[:6].tolist()}(n={len(bad_r)}) cols "
                        f"{bad_c[:6].tolist()}(n={len(bad_c)})\n"
                    )
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
