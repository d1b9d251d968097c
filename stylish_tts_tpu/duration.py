"""Duration class tables and alignment construction.

Capability parity with the reference DurationProcessor
(train/utils.py:385-494): 16 nonuniform duration classes covering 1..46
frames, soft/hard decoding, and duration→alignment-matrix expansion.

TPU re-design: ``duration_to_alignment`` is a vectorised outer comparison
against exclusive/inclusive cumulative sums — no scatter, no
repeat_interleave, fully jittable with static frame buckets, and the
resulting one-hot matrix feeds the ``tokens @ alignment`` matmul on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# class id -> representative duration in frames (reference train/utils.py:391)
CLASS_TO_DUR = np.array(
    [1, 2, 3, 4, 5, 6, 7, 9, 12, 15, 18, 22, 27, 32, 38, 46], dtype=np.float32
)

# duration (0..50 frames) -> class id (reference train/utils.py:396-450)
DUR_TO_CLASS = np.array(
    [0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 7, 8, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11,
     11, 11, 12, 12, 12, 12, 12, 13, 13, 13, 13, 13, 14, 14, 14, 14, 14, 14, 14,
     15, 15, 15, 15, 15, 15, 15, 15, 15],
    dtype=np.int32,
)


class DurationProcessor:
    """Pure-function duration coder; tables are closed-over device constants."""

    def __init__(self, class_count: int = 16, max_duration: int = 50):
        assert class_count == len(CLASS_TO_DUR)
        self.class_count = class_count
        self.max_duration = max_duration
        self.class_to_dur = jnp.asarray(CLASS_TO_DUR)
        self.dur_to_class = jnp.asarray(DUR_TO_CLASS)

    # -- encoding (training targets) ------------------------------------- #

    def dur_to_class_ids(self, durs: jax.Array) -> jax.Array:
        durs = jnp.clip(durs, 1, self.max_duration).astype(jnp.int32)
        return self.dur_to_class[durs]

    def align_to_class(self, alignment: jax.Array) -> jax.Array:
        """alignment [..., T, F] one-hot -> class ids [..., T]."""
        durs = jnp.clip(alignment.sum(axis=-1), 1, self.max_duration)
        return self.dur_to_class_ids(durs)

    # -- decoding (inference) -------------------------------------------- #

    def prediction_to_duration(self, pred: jax.Array) -> jax.Array:
        """Class logits [..., T, C] -> integer durations [..., T].

        Hard argmax for short classes (<7 frames), soft expectation for the
        wide classes, mirroring reference prediction_to_duration
        (train/utils.py:468-474)."""
        soft = (jax.nn.softmax(pred, axis=-1) * self.class_to_dur).sum(axis=-1)
        soft = jnp.clip(jnp.round(soft), 1, None)
        hard = self.class_to_dur[jnp.argmax(pred, axis=-1)]
        return jnp.where(hard < 7, hard, soft)

    def duration_to_alignment(
        self, duration: jax.Array, n_frames: int
    ) -> jax.Array:
        """Durations [T] -> one-hot alignment [T, n_frames].

        token t owns frames [cumsum_excl[t], cumsum_excl[t] + dur[t]).
        Static ``n_frames`` keeps the shape jit-compatible; frames beyond
        the total duration belong to no token (all-zero columns)."""
        duration = duration.astype(jnp.int32)
        ends = jnp.cumsum(duration)
        starts = ends - duration
        frames = jnp.arange(n_frames, dtype=jnp.int32)[None, :]
        return (
            (frames >= starts[:, None]) & (frames < ends[:, None])
        ).astype(jnp.float32)

    def batched_duration_to_alignment(
        self, duration: jax.Array, n_frames: int
    ) -> jax.Array:
        """[B, T] -> [B, T, n_frames]."""
        return jax.vmap(lambda d: self.duration_to_alignment(d, n_frames))(duration)

    def __call__(self, pred: jax.Array, n_frames: int) -> jax.Array:
        """Class logits [T, C] -> alignment [T, n_frames]."""
        return self.duration_to_alignment(
            self.prediction_to_duration(pred), n_frames
        )


def duration_to_alignment_np(duration: np.ndarray, n_frames: int) -> np.ndarray:
    """Host-side (numpy) variant used by the data pipeline collator."""
    duration = duration.astype(np.int64)
    ends = np.cumsum(duration)
    starts = ends - duration
    frames = np.arange(n_frames)[None, :]
    return ((frames >= starts[:, None]) & (frames < ends[:, None])).astype(
        np.float32
    )
