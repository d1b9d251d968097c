"""Pallas TPU kernel for the forward STFT.

The conv-based STFT (ops/stft.py) asks XLA to expand overlapping frames
implicitly; for small hops (75-300 vs n_fft 2048) the expansion factor is
7-27x, so if XLA materialises patches the op becomes HBM-bound.  This
kernel reads each input sample once into VMEM, builds the frame matrix
in on-chip scratch, and feeds the MXU directly:

  grid (batch, frame_tiles, freq_tiles); per (b, ft) the kernel DMAs the
  overlapping input span HBM→VMEM once (at freq-tile 0), assembles
  [frame_tile, n_fft] frames with a fori_loop of VMEM slices, then runs
  one [frame_tile, n_fft] x [n_fft, freq_tile] MXU matmul per freq tile.

Use ``stft_pallas`` on TPU; parity with ops.stft.stft is tested in
tests/test_pallas.py (slow/TPU marker).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stft import _forward_basis


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stft_kernel(
    x_ref,        # [B, T_padded] in ANY/HBM
    basis_ref,    # [n_fft, freq_tile] in VMEM (current freq tile)
    out_ref,      # [1, frame_tile, freq_tile] VMEM block
    x_scratch,    # [span_padded] VMEM
    frames_scratch,  # [frame_tile, n_fft] VMEM
    sem,
    *,
    hop: int,
    n_fft: int,
    frame_tile: int,
    span: int,
):
    b = pl.program_id(0)
    ft = pl.program_id(1)

    @pl.when(pl.program_id(2) == 0)
    def _load_and_frame():
        dma = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(ft * frame_tile * hop, span)],
            x_scratch.at[pl.ds(0, span)],
            sem,
        )
        dma.start()
        dma.wait()

        def body(i, _):
            frames_scratch[i, :] = x_scratch[pl.ds(i * hop, n_fft)]
            return 0

        jax.lax.fori_loop(0, frame_tile, body, 0)

    out_ref[0] = jnp.dot(
        frames_scratch[:], basis_ref[:], preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                              "center", "frame_tile", "freq_tile")
)
def stft_pallas(
    x: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    frame_tile: int = 128,
    freq_tile: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Real STFT of [B, T] -> (real, imag) each [B, frames, n_fft//2+1]."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    b, t = x.shape
    frames = 1 + (t - n_fft) // hop_length
    ft_count = -(-frames // frame_tile)
    span = (frame_tile - 1) * hop_length + n_fft
    # pad so the last tile's DMA stays in bounds
    t_padded = (ft_count * frame_tile - 1) * hop_length + n_fft
    x = jnp.pad(x, ((0, 0), (0, max(0, t_padded - t))))

    basis = np.asarray(_forward_basis(n_fft, win_length))  # [n_fft, 2F]
    two_f = basis.shape[1]
    two_f_padded = _round_up(two_f, freq_tile)
    basis = np.pad(basis, ((0, 0), (0, two_f_padded - two_f)))
    qt_count = two_f_padded // freq_tile

    kernel = functools.partial(
        _stft_kernel,
        hop=hop_length,
        n_fft=n_fft,
        frame_tile=frame_tile,
        span=span,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, ft_count, qt_count),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (n_fft, freq_tile),
                lambda b_, ft_, qt_: (0, qt_),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, frame_tile, freq_tile),
            lambda b_, ft_, qt_: (b_, ft_, qt_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, ft_count * frame_tile, two_f_padded), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((_round_up(span, 128),), jnp.float32),
            pltpu.VMEM((frame_tile, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * frames * n_fft * two_f_padded,
            bytes_accessed=4 * (b * t_padded + n_fft * two_f_padded
                                + b * frames * two_f_padded),
            transcendentals=0,
        ),
    )(x, jnp.asarray(basis))
    out = out[:, :frames]
    freq_bins = n_fft // 2 + 1
    return out[..., :freq_bins], out[..., freq_bins:two_f]
