"""CTC loss with label priors and Viterbi forced alignment — pure XLA.

Replaces the reference's native dependencies:
  * k2 ``ctc_graph``/``DenseFsaVec``/``ctc_loss`` (train/losses.py:508-639)
    — for the plain CTC topology a log-semiring forward scan is exactly
    equivalent; no FSA engine needed.
  * torchaudio ``forced_align`` (train/dataprep/align_text.py:166-172,
    train/stage_type.py:100-106) — a max-semiring scan + backtrace.

Everything is a ``lax.scan`` over time with static [B, S=2L+1] state, so it
jits once per bucket shape and runs entirely on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_targets(targets: jax.Array, blank: int) -> jax.Array:
    """[B, L] -> [B, 2L+1] with blanks interleaved: b t1 b t2 ... tL b."""
    b, l = targets.shape
    ext = jnp.full((b, 2 * l + 1), blank, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


def _transition_masks(ext: jax.Array, blank: int):
    """allow2[b, s]: the skip transition s-2 -> s is permitted."""
    prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :-2]
    allow2 = (ext != blank) & (ext != prev2)
    return allow2


def ctc_loss(
    log_probs: jax.Array,      # [B, T, C] log-softmaxed emissions
    targets: jax.Array,        # [B, L] label ids (padded)
    input_lengths: jax.Array,  # [B]
    target_lengths: jax.Array, # [B]
    blank: int,
    reduction: str = "mean",
) -> jax.Array:
    """Negative log-likelihood of the CTC alignment lattice.

    reduction='mean' divides each sequence's NLL by its target length and
    averages over the batch (k2/torch convention)."""
    b, t_max, _ = log_probs.shape
    ext = _extend_targets(targets, blank)            # [B, S]
    s = ext.shape[1]
    allow2 = _transition_masks(ext, blank)

    emit = jnp.take_along_axis(
        log_probs[:, :, :], ext[:, None, :], axis=2
    )  # [B, T, S] emission score of each lattice state at each frame
    emit = jnp.swapaxes(emit, 0, 1)  # [T, B, S]

    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(emit[0, :, 1])

    def step(alpha, inputs):
        emit_t, t = inputs
        a0 = alpha
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :-1]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :-2]
        a2 = jnp.where(allow2, a2, NEG_INF)
        stacked = jnp.stack([a0, a1, a2], axis=0)
        new = jax.scipy.special.logsumexp(stacked, axis=0) + emit_t
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, t_max)
    alpha, _ = jax.lax.scan(step, alpha0, (emit[1:], ts))

    # final states: s = 2L and s = 2L-1
    last = 2 * target_lengths
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1
    )[:, 0]
    nll = -jnp.logaddexp(a_last, a_prev)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(target_lengths, 1))
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def ctc_loss_with_priors(
    log_probs: jax.Array,
    targets: jax.Array,
    input_lengths: jax.Array,
    target_lengths: jax.Array,
    blank: int,
    log_priors: jax.Array | None = None,
    prior_scale: float = 0.3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """CTC loss with label-prior subtraction.

    Returns (loss, batch_log_prior_sum [C], n_frames) where the last two
    accumulate this batch's contribution to the epoch label priors
    (reference CTCLossWithLabelPriors.forward, train/losses.py:540-599).
    The cross-replica reduction of the prior accumulator is a psum at epoch
    end (losses.py:603-611 does the DDP gather)."""
    t = log_probs.shape[1]
    frame_valid = (
        jnp.arange(t)[None, :] < input_lengths[:, None]
    )[..., None]  # [B, T, 1]
    masked = jnp.where(frame_valid, log_probs, NEG_INF)
    batch_prior_sum = jax.scipy.special.logsumexp(masked, axis=(0, 1))
    n_frames = jnp.sum(input_lengths)

    if log_priors is not None:
        log_probs = log_probs - log_priors[None, None, :] * prior_scale
    loss = ctc_loss(
        log_probs, targets, input_lengths, target_lengths, blank,
        reduction="mean",
    )
    return loss, batch_prior_sum, n_frames


def update_log_priors(
    log_prior_sum: jax.Array,
    log_n_frames: jax.Array,
    threshold: float = -12.0,
) -> jax.Array:
    """Epoch-end prior update: normalise and clamp (losses.py:612-639)."""
    new = log_prior_sum - log_n_frames
    return jnp.maximum(new, threshold)


def forced_align(
    log_probs: jax.Array,      # [B, T, C]
    targets: jax.Array,        # [B, L]
    input_lengths: jax.Array,  # [B]
    target_lengths: jax.Array, # [B]
    blank: int,
    return_states: bool = False,
) -> Tuple[jax.Array, ...]:
    """Viterbi forced alignment over the CTC lattice.

    Returns (labels [B, T] — the emitted token id per frame, blank where
    blank wins; scores [B, T] — the per-frame log-prob of the chosen
    label), matching torchaudio.functional.forced_align outputs.  Frames
    beyond input_length hold blank/0.  With ``return_states`` also returns
    the lattice state index per frame (s = 2k+1 emits token k, s = 2k is
    the blank after token k-1) — used by the alignment precache to derive
    per-token durations without a host loop."""
    b, t_max, _ = log_probs.shape
    ext = _extend_targets(targets, blank)
    s = ext.shape[1]
    allow2 = _transition_masks(ext, blank)

    emit = jnp.take_along_axis(log_probs, ext[:, None, :], axis=2)
    emit = jnp.swapaxes(emit, 0, 1)  # [T, B, S]

    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(emit[0, :, 1])

    def step(alpha, inputs):
        emit_t, t = inputs
        a0 = alpha
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :-1]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :-2]
        a2 = jnp.where(allow2, a2, NEG_INF)
        stacked = jnp.stack([a0, a1, a2], axis=0)  # [3, B, S]
        best = jnp.argmax(stacked, axis=0)         # [B, S] 0/1/2 back-offset
        new = jnp.max(stacked, axis=0) + emit_t
        active = (t < input_lengths)[:, None]
        new = jnp.where(active, new, alpha)
        best = jnp.where(active, best, 0)
        return new, best

    ts = jnp.arange(1, t_max)
    alpha, backptrs = jax.lax.scan(step, alpha0, (emit[1:], ts))
    # backptrs: [T-1, B, S]

    # choose final state
    last = 2 * target_lengths
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1
    )[:, 0]
    final_state = jnp.where(a_last >= a_prev, last, jnp.maximum(last - 1, 0))

    # backtrace from t = input_length-1 down to 0.  We scan in reverse over
    # all frames, carrying the current state; frames beyond the valid length
    # simply keep the final state.
    def back(state, inputs):
        bp_t, t = inputs  # bp_t: [B, S] backpointers for transition t-1 -> t
        inside = (t <= input_lengths - 1)[:, None]  # transition applies
        offset = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        prev_state = state - jnp.where(inside[:, 0], offset, 0)
        return prev_state, state

    ts_rev = jnp.arange(t_max - 1, 0, -1)
    bp_rev = backptrs[::-1]
    state0, states_rev = jax.lax.scan(back, final_state, (bp_rev, ts_rev))
    # states over time: [t=0] + reversed(states_rev)
    states = jnp.concatenate(
        [state0[None, :], states_rev[::-1]], axis=0
    )  # [T, B]
    states = jnp.swapaxes(states, 0, 1)  # [B, T]

    labels = jnp.take_along_axis(ext, states, axis=1)  # [B, T]
    scores = jnp.take_along_axis(
        jnp.swapaxes(emit, 0, 1), states[..., None], axis=2
    )[..., 0]
    frame_valid = jnp.arange(t_max)[None, :] < input_lengths[:, None]
    labels = jnp.where(frame_valid, labels, blank)
    scores = jnp.where(frame_valid, scores, 0.0)
    if return_states:
        return labels, scores, jnp.where(frame_valid, states, 0)
    return labels, scores
