"""Microbenchmark SpecDiscriminator formulations on the real chip.

The round-3 trace shows the MRD at 520 ms of the 723 ms acoustic step:
its fmaps are [8, F, T, 32] with C=32 in the 128-wide lane dim (4x padded
storage AND bandwidth).  Candidate formulations, all numerically the same
conv stack:

  flax     : current nn.Conv channels-last stack (baseline)
  s2d      : space-to-depth — pack 4 freq bins into channels before each
             conv, phase-decomposed weights (C=128 dense lanes, exact)
  batchpack: move batch into lanes via feature_group_count=B grouped conv

Usage: python scripts/mrd_ab.py [--variants flax,s2d] [--res 0]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


RES_SHAPES = {  # (freq, time) fmap grids of the three multi-spec resolutions
    0: (257, 2761),
    1: (513, 1151),
    2: (1025, 576),
}
SPECS = [
    ((3, 9), (1, 1)),
    ((3, 9), (1, 2)),
    ((3, 9), (1, 2)),
    ((3, 9), (1, 2)),
    ((3, 3), (1, 1)),
]


def run_flax(x, key):
    from stylish_tts_tpu.models.discriminator import SpecDiscriminator

    disc = SpecDiscriminator()
    variables = disc.init(key, x[:1])

    def loss(p, xin):
        score, fmap = disc.apply({"params": p}, xin)
        return jnp.sum(score ** 2) + sum(jnp.sum(jnp.abs(f)) for f in fmap)

    return variables["params"], jax.jit(jax.value_and_grad(loss))


def conv_raw(x, w, b, stride):
    """channels-last conv2d with torch-style symmetric padding."""
    kf, kt = w.shape[0], w.shape[1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=((kf // 2, kf // 2), (kt // 2, kt // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


def weightnorm_scale(w, g):
    norm = jnp.sqrt(jnp.sum(w * w, axis=(0, 1, 2), keepdims=True) + 1e-12)
    return w * (g / norm)


def make_params(key, cin_list):
    ks = jax.random.split(key, len(SPECS) + 1)
    params = []
    for i, ((kf, kt), _s) in enumerate(SPECS):
        cin = cin_list[i]
        w = jax.random.normal(ks[i], (kf, kt, cin, 32)) * 0.05
        g = jnp.ones((1, 1, 1, 32))
        b = jnp.zeros((32,))
        params.append((w, g, b))
    wout = jax.random.normal(ks[-1], (3, 3, 32, 1)) * 0.05
    params.append((wout, jnp.ones((1, 1, 1, 1)), jnp.zeros((1,))))
    return params


def run_raw(x, key):
    """Reference lax implementation (same math as flax variant)."""
    params = make_params(key, [x.shape[-1], 32, 32, 32, 32])

    def loss(ps, xin):
        y = xin
        acc = 0.0
        for (w, g, b), ((_kf, _kt), s) in zip(ps[:-1], SPECS):
            y = conv_raw(y, weightnorm_scale(w, g), b, s)
            y = jax.nn.leaky_relu(y, 0.1)
            acc = acc + jnp.sum(jnp.abs(y))
        w, g, b = ps[-1]
        y = conv_raw(y, weightnorm_scale(w, g), b, (1, 1))
        return jnp.sum(y ** 2) + acc

    return params, jax.jit(jax.value_and_grad(loss))


def run_pallas(x, key):
    """Same stack through the round-4 packed-frequency Pallas kernel:
    conv_0 (cin=1, negligible FLOPs) and the cout=1 head stay XLA; the
    four C=32 conv layers run fused and lane-dense."""
    from stylish_tts_tpu.ops.spec_conv import (
        pack_freq, spec_conv2d_packed, unpack_freq,
    )

    params = make_params(key, [x.shape[-1], 32, 32, 32, 32])
    F = x.shape[1]

    def loss(ps, xin):
        w, g, b = ps[0]
        y = jax.nn.leaky_relu(
            conv_raw(xin, weightnorm_scale(w, g), b, SPECS[0][1]), 0.1
        )
        acc = jnp.sum(jnp.abs(y))
        yq = pack_freq(y)
        for (w, g, b), ((_kf, _kt), s) in zip(ps[1:-1], SPECS[1:]):
            yq = spec_conv2d_packed(
                yq, weightnorm_scale(w, g), b, F, s[1], 0.1
            )
            acc = acc + jnp.sum(jnp.abs(yq))
        y = unpack_freq(yq, F, 32)
        w, g, b = ps[-1]
        y = conv_raw(y, weightnorm_scale(w, g), b, (1, 1))
        return jnp.sum(y ** 2) + acc

    return params, jax.jit(jax.value_and_grad(loss))


def run_dfsplit(x, key, pad128=False):
    """Lane-dense df-split: each C32 conv (3,9)/stride-(1,2) becomes a
    (1,9) conv with C_out=3*32=96 (the 3 freq taps move into output
    channels) followed by a fused 3-way shifted add over freq.  Exact
    same math and the SAME parameter tensors — W2 is a reshape/transpose
    of W — but the MXU contraction is K=288 x N=96 (75% lanes) instead
    of K=864 x N=32 (25%), and the freq-tap reduction becomes cheap
    elementwise adds.  pad128 zero-pads N to 128 full lanes."""
    params = make_params(key, [x.shape[-1], 32, 32, 32, 32])

    def df_conv(xin, w, g, b, stride):
        wn = weightnorm_scale(w, g)           # [3, kt, 32, 32]
        kf, kt, ci, co = wn.shape
        w2 = jnp.transpose(wn, (1, 2, 0, 3)).reshape(1, kt, ci, kf * co)
        if pad128:
            w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, 0), (0, 128 - kf * co)))
        z = jax.lax.conv_general_dilated(
            xin, w2.astype(xin.dtype), window_strides=(1, stride[1]),
            padding=((0, 0), (kt // 2, kt // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0), (0, 0)))
        f = xin.shape[1]
        y = (zp[:, 0:f, :, 0:co] + zp[:, 1:f + 1, :, co:2 * co]
             + zp[:, 2:f + 2, :, 2 * co:3 * co])
        return y + b.astype(y.dtype)

    def loss(ps, xin):
        y = xin
        acc = 0.0
        for i, ((w, g, b), ((_kf, _kt), s)) in enumerate(zip(ps[:-1], SPECS)):
            if i == 0:
                y = conv_raw(y, weightnorm_scale(w, g), b, s)
            else:
                y = df_conv(y, w, g, b, s)
            y = jax.nn.leaky_relu(y, 0.1)
            acc = acc + jnp.sum(jnp.abs(y))
        w, g, b = ps[-1]
        y = conv_raw(y, weightnorm_scale(w, g), b, (1, 1))
        return jnp.sum(y ** 2) + acc

    return params, jax.jit(jax.value_and_grad(loss))


def s2d_pack(x, factor):
    """[B, F, T, C] -> [B, F/factor, T, C*factor] (freq space-to-depth).
    Freq index f = fo*factor + phase; channel block layout [phase, C]."""
    b, f, t, c = x.shape
    pad = (-f) % factor
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        f += pad
    x = x.reshape(b, f // factor, factor, t, c)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, f // factor, t, factor * c)


def s2d_weights(w, factor):
    """Phase-decompose a (kf, kt, cin, cout) freq-dense conv into an
    equivalent conv on freq-packed inputs (jit-safe: static indices only).

    Output y[fo*factor+p] needs x[fo*factor+p+df-kf//2] for df in 0..kf-1.
    In packed space, x index (fq, phase_in) with fq = (fo*factor+p+df-kf//2)
    // factor.  The packed kernel spans dfq in {-1, 0, 1} (since kf <=
    factor+1 when factor=4, kf=3): kernel (3, kt, factor*cin, factor*cout)
    with zeros where phases don't line up."""
    kf, kt, cin, cout = w.shape
    half = kf // 2
    wp = jnp.zeros((3, kt, factor * cin, factor * cout), w.dtype)
    for p_out in range(factor):
        for df in range(kf):
            src = p_out + df - half  # freq offset within packed block
            dfq, p_in = divmod(src + factor, factor)
            dfq -= 1  # back to {-1, 0, 1}
            wp = wp.at[
                dfq + 1, :, p_in * cin:(p_in + 1) * cin,
                p_out * cout:(p_out + 1) * cout,
            ].set(w[df])
    return wp


def run_s2d(x, key, factor=4):
    """Exact same conv stack computed on freq-packed activations.
    Channels become 32*factor = 128 -> dense lane tiling.

    Fake freq rows from the pad-to-multiple-of-factor would pick up
    bias + leaky_relu and leak into the next layer's boundary rows, so a
    static mask zeroes them after each layer (the original conv's zero
    padding semantics)."""
    f_real = x.shape[1]
    params = make_params(key, [x.shape[-1], 32, 32, 32, 32])
    xp = s2d_pack(x, factor)
    fq = xp.shape[1]
    row_real = (
        jnp.arange(fq * factor).reshape(fq, factor) < f_real
    )  # [FQ, factor]
    mask = jnp.repeat(row_real, 32, axis=1)[None, :, None, :]  # [1,FQ,1,128]

    def loss(ps, xin):
        y = xin
        acc = 0.0
        for (w, g, b), ((_kf, _kt), s) in zip(ps[:-1], SPECS):
            wn = weightnorm_scale(w, g)
            wp = s2d_weights(wn, factor)
            bp = jnp.tile(b, factor)
            kt = w.shape[1]
            y = jax.lax.conv_general_dilated(
                y, wp.astype(y.dtype), window_strides=(1, s[1]),
                padding=((1, 1), (kt // 2, kt // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bp.astype(y.dtype)
            y = jax.nn.leaky_relu(y, 0.1) * mask.astype(y.dtype)
            acc = acc + jnp.sum(jnp.abs(y))
        w, g, b = ps[-1]
        wn = weightnorm_scale(w, g)
        wp = s2d_weights(wn, factor)
        y = jax.lax.conv_general_dilated(
            y, wp.astype(y.dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(b, factor).astype(y.dtype)
        # head cout=1: packed channels = one per phase
        y = y * row_real[None, :, None, :].astype(y.dtype)
        return jnp.sum(y ** 2) + acc

    return params, jax.jit(jax.value_and_grad(loss)), xp


def bench(fn, params, x, iters=5):
    v, g = fn(params, x)
    np.asarray(v), [np.asarray(l) for l in jax.tree_util.tree_leaves(g)]
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = fn(params, x)
    # fetch to host: relay buffers can report ready before execution
    np.asarray(v), [np.asarray(l) for l in jax.tree_util.tree_leaves(g)]
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variants", default="raw,s2d")
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    f, t = RES_SHAPES[args.res]
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (args.batch, f, t, 1), dt)

    out = {"res": args.res, "freq": f, "time": t, "dtype": args.dtype}
    for variant in args.variants.split(","):
        if variant == "flax":
            params, fn = run_flax(x, key)
            dtv = bench(fn, params, x)
        elif variant == "raw":
            params, fn = run_raw(x, key)
            dtv = bench(fn, params, x)
        elif variant == "pallas":
            params, fn = run_pallas(x, key)
            dtv = bench(fn, params, x)
        elif variant == "dfsplit":
            params, fn = run_dfsplit(x, key)
            dtv = bench(fn, params, x)
        elif variant == "dfsplit128":
            params, fn = run_dfsplit(x, key, pad128=True)
            dtv = bench(fn, params, x)
        elif variant == "s2d":
            params, fn, xp = run_s2d(x, key)
            dtv = bench(fn, params, xp)
        else:
            continue
        out[variant + "_s"] = round(dtv, 4)
        sys.stderr.write(f"{variant}: {dtv:.4f} s (fwd+bwd)\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
