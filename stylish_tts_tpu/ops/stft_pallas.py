"""Pallas TPU kernel for the forward STFT.

The conv-based STFT (ops/stft.py) asks XLA to expand overlapping frames
implicitly; for small hops (75-300 vs n_fft 2048) the expansion factor is
7-27x, so if XLA materialises patches the op becomes HBM-bound.  This
kernel reads each input sample once and assembles frames on-chip:

  * the host reshapes audio into hop-rows and pads the row width to the
    128-lane grid: X [B, rows, 128] with X[b, r, :hop] = x[b, r*hop:(r+1)*hop]
    (lane-aligned full-row DMAs; the Mosaic compiler on this TPU rejects
    sub-row / non-128-lane DMA slices);
  * grid (batch, frame_tiles, freq_tiles): per (b, ft) the kernel DMAs
    rows [ft*TILE, ft*TILE + TILE + K) to VMEM once (scratch persists
    across the freq-tile axis), assembles [TILE, K*hop] frames with K
    static slice copies (frame t chunk k = row t+k), then one
    [TILE, n_fft'] x [n_fft', freq_tile] MXU matmul per freq tile against
    a basis zero-padded from n_fft to K*hop rows.

Correctness is tested in interpreter mode on CPU (tests/test_pallas.py)
and against ops.stft.stft on TPU via the slow marker.
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

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stft_kernel(
    x_ref,           # [B, rows_padded, lane_w] in ANY/HBM (hop-padded rows)
    basis_ref,       # [K*hop, freq_tile] VMEM block (current freq tile)
    out_ref,         # [1, frame_tile, freq_tile] VMEM block
    rows_scratch,    # [frame_tile + K, lane_w] VMEM
    frames_scratch,  # [frame_tile, K*hop] VMEM
    sem,
    *,
    hop: int,
    k_chunks: int,
    frame_tile: int,
):
    b = pl.program_id(0)
    ft = pl.program_id(1)

    @pl.when(pl.program_id(2) == 0)
    def _load_frames():
        dma = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(ft * frame_tile, frame_tile + k_chunks), :],
            rows_scratch,
            sem,
        )
        dma.start()
        dma.wait()
        for k in range(k_chunks):
            frames_scratch[:, k * hop : (k + 1) * hop] = rows_scratch[
                k : k + frame_tile, 0:hop
            ]

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
    hop = hop_length
    lane_w = _round_up(hop, LANES)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    b, t = x.shape
    frames = 1 + (t - n_fft) // hop
    k_chunks = -(-n_fft // hop)
    ft_count = -(-frames // frame_tile)

    # hop-rows layout, padded so every tile's DMA stays in bounds
    rows_needed = ft_count * frame_tile + k_chunks
    t_rows = rows_needed * hop
    x = jnp.pad(x, ((0, 0), (0, max(0, t_rows - t))))[:, :t_rows]
    x_rows = x.reshape(b, rows_needed, hop)
    x_rows = jnp.pad(x_rows, ((0, 0), (0, 0), (0, lane_w - hop)))

    basis = np.asarray(_forward_basis(n_fft, win_length))  # [n_fft, 2F]
    two_f = basis.shape[1]
    two_f_padded = _round_up(two_f, freq_tile)
    basis = np.pad(
        basis,
        ((0, k_chunks * hop - n_fft), (0, two_f_padded - two_f)),
    )  # zero rows beyond n_fft: frame tail chunks contribute nothing
    qt_count = two_f_padded // freq_tile

    kernel = functools.partial(
        _stft_kernel, hop=hop, k_chunks=k_chunks, frame_tile=frame_tile,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, ft_count, qt_count),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k_chunks * hop, freq_tile),
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
            pltpu.VMEM((frame_tile + k_chunks, lane_w), jnp.float32),
            pltpu.VMEM((frame_tile, k_chunks * hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * frames * n_fft * two_f_padded,
            bytes_accessed=4 * (b * rows_needed * LANES
                                + k_chunks * hop * two_f_padded
                                + b * frames * two_f_padded),
            transcendentals=0,
        ),
    )(x_rows, jnp.asarray(basis))
    out = out[:, :frames]
    freq_bins = n_fft // 2 + 1
    return out[..., :freq_bins], out[..., freq_bins:two_f]
