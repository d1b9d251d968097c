"""Pallas TPU kernel for the SpecDiscriminator conv2d layers (round 4).

Why: XLA lowers the channels-last C_in=C_out=32 convs into matmuls with
K=32, N=32 — 4x lane waste on both MXU axes — and the round-3 device
trace put the MRD stack at 520 ms of the 723 ms acoustic train step.
Reference counterpart: the torch discriminator conv stack,
/root/reference/src/stylish_tts/train/models/discriminator.py:31-99
(cuDNN picks implicit-GEMM kernels on CUDA; this is the TPU analogue).

Round-4 design — PACKED-FREQUENCY layout (the r3 kernel died in Mosaic
on its stride-2 lane-pairing gather; every idiom here was compile-probed
on the chip first, scripts/mosaic_probe.py):

  * activations live as  xq[b, fq, t, p*C+c] = x[b, 4*fq+p, t, c] —
    4 rows of the kf(=3)-tap axis share one 128-wide lane vector, so
    every HBM byte moved is useful (the unpacked layout wastes 3/4 of
    each lane).  In the discriminator the PACKED axis is the model's
    time-frame axis and the TILED axis is frequency (kernel (3, 9),
    stride (1, 2)) — the op itself is orientation-agnostic.
  * each grid step computes FQ_TILE consecutive packed blocks x t_tile
    tiled positions.  Per output block: kt matmuls
    [t_tile, rows*cin(=192)] @ [192, 128] accumulated over the taps.
    Grouping the patch concatenate BY TAP keeps every concat input at
    the SAME sublane offset, which Mosaic accepts in native bf16 (mixed
    sublane offsets are the r3 "offset mismatch" failure, and
    pltpu.roll — the other fix — only handles 32-bit data).
  * the input tile ((FQ_TILE+2) packed blocks x window) arrives as ONE
    static-size DMA per parity array at grid-linear offsets — inputs are
    pre-padded in XLA so the kernel has no clamps/branches/masks on the
    fetch path — double-buffered across grid steps.
  * stride-2 on the tiled axis via an XLA even/odd parity pre-split (two
    packed arrays), keeping every in-kernel slice full-lane and static.
  * bias + leaky_relu fused; the tail block's padding phases are zeroed
    in-kernel so garbage never leaks across layers or into the
    feature-matching loss.
  * custom_vjp: dx reuses this forward kernel (rotated io-swapped
    weights, stride-dilated upstream grad); dW is a second kernel
    accumulating tap-major P^T @ dY in f32 across the grid.

Weight layout stays torch/flax-parity (kf, kt, C_in, C_out); packing to
[kt, rows*cin, PHASE*cout] happens in jnp (tiny tensors).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PHASE = 4          # packed rows per lane vector (4 * 32 ch = 128 lanes)
TM = 8             # margin on fetched tiles along the tiled axis
VMEM_TILE_BUDGET = 4 * 1024 * 1024  # input-tile double-buffer budget


def _choose_tile(tout: int) -> int:
    """Block length on the tiled axis: for short axes use one snug
    block; otherwise balance tail waste against per-block overhead."""
    if tout <= 1024:
        return -(-tout // 16) * 16
    best, best_cost = 256, None
    for cand in (256, 384, 512, 768, 1024):
        blocks = math.ceil(tout / cand)
        cost = blocks * cand + blocks * 160  # padded slots + per-block tax
        if best_cost is None or cost < best_cost:
            best, best_cost = cand, cost
    return best


def _choose_fq_tile(fq: int, win: int, lanes: int, itemsize: int,
                    n_in: int, t_tile: int) -> int:
    """Packed blocks per grid step, bounded by (a) the double-buffer
    VMEM budget for input tiles and (b) an M-axis cap so the stacked
    patch/accumulator working set (P_dt + f32 acc + output block, all
    proportional to fq_tile*t_tile) stays well under scoped VMEM."""
    per_block = 2 * n_in * win * lanes * itemsize
    fit = VMEM_TILE_BUDGET // max(per_block, 1) - 2
    return max(1, min(8, fq, fit))


def _rows(kf: int) -> int:
    return PHASE + kf - 1  # packed rows feeding one 4-row output block


def pack_freq(x: jax.Array, phase: int = PHASE) -> jax.Array:
    """[B, F, T, C] -> [B, ceil(F/phase), T, phase*C], zero-padded rows."""
    b, f, t, c = x.shape
    pad = (-f) % phase
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        f += pad
    x = x.reshape(b, f // phase, phase, t, c)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, f // phase, t, phase * c)


def unpack_freq(xq: jax.Array, f: int, c: int) -> jax.Array:
    """Inverse of pack_freq: [B, FQ, T, phase*C] -> [B, f, T, C]."""
    b, fq, t, pc = xq.shape
    phase = pc // c
    x = xq.reshape(b, fq, t, phase, c).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, fq * phase, t, c)[:, :f]


def pack_weights(w: jax.Array, phase: int = PHASE) -> jax.Array:
    """(kf, kt, cin, cout) -> [kt, rows*cin, phase*cout], tap-major:
    W'[dt][(slot, ci), (p, co)] = w[slot - p, dt, ci, co] (zero where
    slot-p falls outside the kf taps)."""
    kf, kt, cin, cout = w.shape
    rows = phase + kf - 1
    wp = jnp.zeros((rows, kt, cin, phase, cout), w.dtype)
    for p in range(phase):
        wp = wp.at[p:p + kf, :, :, p, :].set(w)
    return wp.transpose(1, 0, 2, 3, 4).reshape(
        kt, rows * cin, phase * cout
    )


def unpack_wgrad(dwp: jax.Array, kf: int, kt: int, cin: int, cout: int,
                 phase: int = PHASE) -> jax.Array:
    """Adjoint of pack_weights: [kt, rows*cin, phase*cout] -> (kf,kt,cin,cout)."""
    rows = phase + kf - 1
    g = dwp.reshape(kt, rows, cin, phase, cout).transpose(1, 0, 2, 3, 4)
    dw = jnp.zeros((kf, kt, cin, cout), dwp.dtype)
    for p in range(phase):
        dw = dw + g[p:p + kf, :, :, p, :]
    return dw


def _conv_out_len(tin: int, kt: int, stride: int) -> int:
    pad = kt // 2
    return (tin + 2 * pad - kt) // stride + 1


# --------------------------------------------------------------------- #
# Patch assembly (shared by fwd and dW kernels)
# --------------------------------------------------------------------- #


def _tap_patches(xts, slot, f, kf, kt, cin, stride, t_tile):
    """Yield (dt, P_dt [t_tile, rows*cin]) patches for local packed
    block f, one per tap dt.  All concat inputs of a tap share its
    sublane offset (bf16-legal; mixed offsets are the r3 Mosaic
    failure).  Per-block (rather than M-stacked) assembly keeps the
    VMEM working set small enough to run fq_tile=8 everywhere — measured
    faster than M-stacking, whose VMEM forced tiny fq_tiles."""
    half = kt // 2
    rows = _rows(kf)
    for dt in range(kt):
        if stride == 1:
            arr, start = 0, dt
        elif (dt - half) % 2 == 0:
            arr, start = 0, (dt - half) // 2 + 2
        else:
            arr, start = 1, (dt - half - 1) // 2 + 2
        cols = []
        for g in range(rows):
            blk, lane = divmod(g + PHASE - (kf // 2), PHASE)
            lo = lane * cin
            cols.append(
                xts[arr][slot, f + blk, start:start + t_tile,
                         lo:lo + cin]
            )
        yield dt, jnp.concatenate(cols, axis=1)


def _tile_copies(refs, xts, sems, slot, b, fqt, tb, win, t_tile,
                 fq_tile):
    """One DMA per parity array: (fq_tile+2) consecutive packed blocks x
    win.  Static sizes; offsets grid-linear (inputs pre-padded in XLA)."""
    t0 = tb * t_tile  # parity arrays are already stride-resolved
    f0 = fqt * fq_tile
    out = []
    for ref, xt, sem in zip(refs, xts, sems):
        out.append(pltpu.make_async_copy(
            ref.at[b, pl.ds(f0, fq_tile + 2), pl.ds(t0, win), :],
            xt.at[slot],
            sem.at[slot],
        ))
    return out


def _fetch_pipelined(refs, xts, sems, win, t_tile, fq_tile):
    """Double-buffered fetch: block N+1's tiles stream in while block N
    computes (BlockSpec operands are auto-pipelined by Pallas; manual
    ANY-space fetches are not).  Returns the current buffer slot."""
    b, fqt, tb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_fqt, n_tb = pl.num_programs(1), pl.num_programs(2)
    total = pl.num_programs(0) * n_fqt * n_tb
    step = (b * n_fqt + fqt) * n_tb + tb
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        for cp in _tile_copies(
            refs, xts, sems, 0, b, fqt, tb, win, t_tile, fq_tile
        ):
            cp.start()

    nstep = step + 1

    @pl.when(nstep < total)
    def _():
        ntb = jax.lax.rem(nstep, n_tb)
        rem = jax.lax.div(nstep, n_tb)
        nfqt = jax.lax.rem(rem, n_fqt)
        nb = jax.lax.div(rem, n_fqt)
        nslot = jax.lax.rem(nstep, 2)
        for cp in _tile_copies(
            refs, xts, sems, nslot, nb, nfqt, ntb, win, t_tile, fq_tile
        ):
            cp.start()

    for cp in _tile_copies(
        refs, xts, sems, slot, b, fqt, tb, win, t_tile, fq_tile
    ):
        cp.wait()
    return slot


def _phase_mask(fq_abs, f_rows, cout, shape):
    """[t_tile, PHASE*cout] mask zeroing phases whose absolute packed row
    >= f_rows (only bites in the tail block)."""
    lane_phase = jax.lax.broadcasted_iota(jnp.int32, shape, 1) // cout
    return lane_phase < (f_rows - PHASE * fq_abs)


# --------------------------------------------------------------------- #
# Forward kernel
# --------------------------------------------------------------------- #


def _fwd_kernel(*args, kf, kt, cin, cout, stride, f_rows, win, leaky,
                n_in, t_tile, fq_tile):
    refs = args[:n_in]
    wp_ref, bp_ref, y_ref = args[n_in:n_in + 3]
    scratch = args[n_in + 3:]
    xts, sems = scratch[:n_in], scratch[n_in:]
    fqt = pl.program_id(1)

    slot = _fetch_pipelined(refs, xts, sems, win, t_tile, fq_tile)
    for f in range(fq_tile):
        acc = jnp.zeros((t_tile, PHASE * cout), jnp.float32)
        for dt, p in _tap_patches(
            xts, slot, f, kf, kt, cin, stride, t_tile
        ):
            acc = acc + jnp.dot(
                p, wp_ref[dt], preferred_element_type=jnp.float32
            )
        acc = acc + bp_ref[:].astype(jnp.float32)
        if leaky is not None:
            acc = jnp.where(acc >= 0, acc, acc * leaky)
        mask = _phase_mask(fqt * fq_tile + f, f_rows, cout, acc.shape)
        acc = jnp.where(mask, acc, 0.0)
        y_ref[0, f] = acc.astype(y_ref.dtype)


def _pad_input(xq, stride, t_blocks, kt, t_tile, n_fqt, fq_tile):
    """Pre-pad (and for stride 2, parity-split) the packed input so every
    kernel fetch is static and in-bounds.  Packed axis: 1 zero block on
    the left + tail to n_fqt*fq_tile + 2.  Tiled axis: stride 1 gets
    left pad kt//2 (tap slice start == dt); stride 2 (kt=9) parity
    arrays get left pad 2."""
    B, FQ, Tin, L = xq.shape
    half = kt // 2
    need = t_blocks * t_tile + TM
    fpad = n_fqt * fq_tile + 2 - FQ - 1
    if stride == 1:
        x = jnp.pad(
            xq, ((0, 0), (1, fpad), (half, need - Tin - half), (0, 0))
        )
        return (x,)
    assert half == 4, "stride-2 path assumes kt=9 (reference parity)"
    te = (Tin + 1) // 2
    if Tin % 2:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 1), (0, 0)))
    xe, xo = xq[:, :, 0::2], xq[:, :, 1::2]
    xe = jnp.pad(xe, ((0, 0), (1, fpad), (2, need - te - 2), (0, 0)))
    xo = jnp.pad(xo, ((0, 0), (1, fpad), (2, need - te - 2), (0, 0)))
    return (xe, xo)


def _fwd_call(xq, wp, bp, *, kf, kt, cin, cout, stride, f_rows, leaky,
              interpret):
    if interpret is None:  # auto: interpreter on CPU backends
        interpret = jax.default_backend() == "cpu"
    B, FQ, Tin, L = xq.shape
    Tout = _conv_out_len(Tin, kt, stride)
    t_tile = _choose_tile(Tout)
    t_blocks = pl.cdiv(Tout, t_tile)
    win = t_tile + TM
    n_in = 1 if stride == 1 else 2
    fq_tile = _choose_fq_tile(FQ, win, L, xq.dtype.itemsize, n_in, t_tile)
    n_fqt = pl.cdiv(FQ, fq_tile)
    ins = _pad_input(xq, stride, t_blocks, kt, t_tile, n_fqt, fq_tile)

    kern = functools.partial(
        _fwd_kernel, kf=kf, kt=kt, cin=cin, cout=cout, stride=stride,
        f_rows=f_rows, win=win, leaky=leaky, n_in=n_in, t_tile=t_tile,
        fq_tile=fq_tile,
    )
    y = pl.pallas_call(
        kern,
        grid=(B, n_fqt, t_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(
            (1, fq_tile, t_tile, PHASE * cout),
            lambda b, fqt, tb: (b, fqt, tb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_fqt * fq_tile, t_blocks * t_tile, PHASE * cout),
            xq.dtype,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, fq_tile + 2, win, L), xq.dtype)
        ] * n_in
        + [pltpu.SemaphoreType.DMA((2,))] * n_in,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            # USEFUL conv flops only (not the 2x structurally-zero MACs),
            # so whole-step cost_analysis stays comparable to the XLA path
            flops=2 * B * f_rows * Tout * kf * kt * cin * cout,
            bytes_accessed=sum(x.size * x.dtype.itemsize for x in ins),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*ins, wp, bp)
    return y[:, :FQ, :Tout]


# --------------------------------------------------------------------- #
# dW kernel: accumulate tap-major P^T @ dY over the whole grid
# --------------------------------------------------------------------- #


def _dw_kernel(*args, kf, kt, cin, cout, stride, f_rows, win, n_in,
               t_tile, fq_tile):
    refs = args[:n_in]
    dy_ref, dwp_ref = args[n_in:n_in + 2]
    scratch = args[n_in + 2:]
    xts, sems = scratch[:n_in], scratch[n_in:]
    b, fqt, tb = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    slot = _fetch_pipelined(refs, xts, sems, win, t_tile, fq_tile)
    first = (b == 0) & (fqt == 0) & (tb == 0)
    rows = _rows(kf)
    K = rows * cin
    acc = [jnp.zeros((K, PHASE * cout), jnp.float32) for _ in range(kt)]
    for f in range(fq_tile):
        dy = dy_ref[0, f]
        for dt, p in _tap_patches(
            xts, slot, f, kf, kt, cin, stride, t_tile
        ):
            acc[dt] = acc[dt] + jax.lax.dot_general(
                p, dy, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    for dt in range(kt):

        @pl.when(first)
        def _(dt=dt):
            dwp_ref[dt] = acc[dt]

        @pl.when(jnp.logical_not(first))
        def _(dt=dt):
            dwp_ref[dt] = dwp_ref[dt] + acc[dt]


def _dw_call(xq, dy, *, kf, kt, cin, cout, stride, f_rows, interpret):
    if interpret is None:  # auto: interpreter on CPU backends
        interpret = jax.default_backend() == "cpu"
    B, FQ, Tin, L = xq.shape
    Tout = dy.shape[2]
    rows = _rows(kf)
    K = rows * cin
    t_tile = _choose_tile(Tout)
    t_blocks = pl.cdiv(Tout, t_tile)
    win = t_tile + TM
    n_in = 1 if stride == 1 else 2
    fq_tile = _choose_fq_tile(FQ, win, L, xq.dtype.itemsize, n_in, t_tile)
    n_fqt = pl.cdiv(FQ, fq_tile)
    ins = _pad_input(xq, stride, t_blocks, kt, t_tile, n_fqt, fq_tile)
    dy = jnp.pad(
        dy,
        ((0, 0), (0, n_fqt * fq_tile - FQ),
         (0, t_blocks * t_tile - Tout), (0, 0)),
    )

    kern = functools.partial(
        _dw_kernel, kf=kf, kt=kt, cin=cin, cout=cout, stride=stride,
        f_rows=f_rows, win=win, n_in=n_in, t_tile=t_tile,
        fq_tile=fq_tile,
    )
    return pl.pallas_call(
        kern,
        grid=(B, n_fqt, t_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in
        + [
            pl.BlockSpec(
                (1, fq_tile, t_tile, PHASE * cout),
                lambda b, fqt, tb: (b, fqt, tb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (kt, K, PHASE * cout), lambda b, fqt, tb: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (kt, K, PHASE * cout), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, fq_tile + 2, win, L), xq.dtype)
        ] * n_in
        + [pltpu.SemaphoreType.DMA((2,))] * n_in,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*ins, dy)


# --------------------------------------------------------------------- #
# Public op (custom VJP)
# --------------------------------------------------------------------- #


def _freq_mask(f_rows, fq, cout, dtype):
    """[FQ, PHASE*cout] validity mask for packed rows (XLA side)."""
    phase = jnp.arange(PHASE * cout) // cout
    rows = jnp.arange(fq)[:, None] * PHASE + phase[None, :]
    return (rows < f_rows).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def spec_conv2d_packed(xq, w, b, f_rows: int, stride_t: int = 1,
                       leaky: float | None = 0.1,
                       interpret: bool | None = None):
    """Fused conv2d(+bias+leaky_relu) on the packed layout.

    xq: [B, FQ, T, PHASE*cin] from pack_freq; w: (kf, kt, cin, cout)
    torch-parity weights with symmetric padding (kf//2, kt//2) and stride
    (1, stride_t); f_rows = true rows of the packed axis (pre-packing).
    Returns the packed output [B, FQ, Tout, PHASE*cout] with padding
    phases zeroed.  leaky=None disables the activation.
    """
    kf, kt, cin, cout = w.shape
    wp = pack_weights(w).astype(xq.dtype)
    bp = jnp.tile(b, PHASE).astype(xq.dtype)
    return _fwd_call(
        xq, wp, bp, kf=kf, kt=kt, cin=cin, cout=cout, stride=stride_t,
        f_rows=f_rows, leaky=leaky, interpret=interpret,
    )


def _packed_fwd(xq, w, b, f_rows, stride_t, leaky, interpret):
    y = spec_conv2d_packed(xq, w, b, f_rows, stride_t, leaky, interpret)
    return y, (xq, w, y)


def _packed_bwd(f_rows, stride_t, leaky, interpret, res, dy):
    xq, w, y = res
    kf, kt, cin, cout = w.shape

    if leaky is not None:
        # leaky_relu is monotone: pre-activation sign == output sign
        slope = jnp.where(y >= 0, jnp.ones((), dy.dtype),
                          jnp.asarray(leaky, dy.dtype))
        dpre = dy * slope
    else:
        dpre = dy
    # padding phases carry no gradient (their fwd output is exactly 0)
    dpre = dpre * _freq_mask(f_rows, xq.shape[1], cout, dpre.dtype)[
        None, :, None, :
    ]

    db_packed = jnp.sum(dpre, axis=(0, 1, 2)).astype(jnp.float32)
    db = jnp.sum(db_packed.reshape(PHASE, cout), axis=0)

    dwp = _dw_call(
        xq, dpre.astype(xq.dtype), kf=kf, kt=kt, cin=cin, cout=cout,
        stride=stride_t, f_rows=f_rows, interpret=interpret,
    )
    dw = unpack_wgrad(dwp, kf, kt, cin, cout)

    # dx: transposed conv == this forward kernel at stride 1 on the
    # stride-dilated upstream grad with rotated, io-swapped weights (the
    # packed axis is symmetric kf with kf//2 padding, so the same phase
    # packing applies)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    if stride_t > 1:
        B, FQ, Tout, Lc = dpre.shape
        dil = jnp.zeros((B, FQ, Tout, stride_t, Lc), dpre.dtype)
        dil = dil.at[:, :, :, 0, :].set(dpre)
        dyd = dil.reshape(B, FQ, Tout * stride_t, Lc)
    else:
        dyd = dpre
    Tin = xq.shape[2]
    wp_rot = pack_weights(w_rot).astype(dyd.dtype)
    bz = jnp.zeros((PHASE * cin,), dyd.dtype)
    dx_full = _fwd_call(
        dyd, wp_rot, bz, kf=kf, kt=kt, cin=cout, cout=cin, stride=1,
        f_rows=f_rows, leaky=None, interpret=interpret,
    )
    dx = dx_full[:, :, :Tin, :].astype(xq.dtype)
    return dx, dw.astype(w.dtype), db.astype(w.dtype)


spec_conv2d_packed.defvjp(_packed_fwd, _packed_bwd)


def spec_conv2d_reference(x, w, b, stride_t: int = 1,
                          leaky: float | None = 0.1):
    """lax.conv_general_dilated reference on the UNPACKED layout (the
    non-pallas production path and the CPU fallback)."""
    kf, kt = w.shape[0], w.shape[1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, stride_t),
        padding=((kf // 2, kf // 2), (kt // 2, kt // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    if leaky is not None:
        y = jax.nn.leaky_relu(y, leaky)
    return y
