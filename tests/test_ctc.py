"""CTC-with-priors and Viterbi forced-align parity vs torch (CPU)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stylish_tts_tpu.ops import ctc as jctc


def _random_problem(seed, b=3, t=24, c=7, lmax=6, blank=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    target_lengths = rng.integers(2, lmax + 1, size=b)
    input_lengths = np.array(
        [rng.integers(2 * tl + 1, t + 1) for tl in target_lengths]
    )
    targets = np.zeros((b, lmax), dtype=np.int64)
    for i, tl in enumerate(target_lengths):
        targets[i, :tl] = rng.integers(1, c, size=tl)
    return log_probs, targets, input_lengths, target_lengths, blank


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_torch(seed):
    log_probs, targets, il, tl, blank = _random_problem(seed)
    ref = torch.nn.functional.ctc_loss(
        torch.from_numpy(log_probs).permute(1, 0, 2),
        torch.from_numpy(targets),
        torch.from_numpy(il),
        torch.from_numpy(tl),
        blank=blank,
        reduction="mean",
        zero_infinity=False,
    ).item()
    got = float(
        jctc.ctc_loss(
            jnp.asarray(log_probs),
            jnp.asarray(targets),
            jnp.asarray(il),
            jnp.asarray(tl),
            blank,
            reduction="mean",
        )
    )
    assert abs(got - ref) < 1e-4


def test_ctc_loss_nonblank_blank_index():
    # reference uses blank = n_tokens (last class), not 0
    log_probs, targets, il, tl, _ = _random_problem(3, c=7)
    # remap: use blank=6, targets in 0..5 are already valid (1..6 -> shift)
    targets = np.clip(targets - 1, 0, 5)
    ref = torch.nn.functional.ctc_loss(
        torch.from_numpy(log_probs).permute(1, 0, 2),
        torch.from_numpy(targets),
        torch.from_numpy(il),
        torch.from_numpy(tl),
        blank=6,
        reduction="mean",
    ).item()
    got = float(
        jctc.ctc_loss(
            jnp.asarray(log_probs), jnp.asarray(targets),
            jnp.asarray(il), jnp.asarray(tl), 6,
        )
    )
    assert abs(got - ref) < 1e-4


def test_prior_accumulation():
    log_probs, targets, il, tl, blank = _random_problem(4)
    loss, prior_sum, n_frames = jctc.ctc_loss_with_priors(
        jnp.asarray(log_probs), jnp.asarray(targets),
        jnp.asarray(il), jnp.asarray(tl), blank,
    )
    assert int(n_frames) == il.sum()
    # logsumexp of per-frame log-probs over valid frames only
    acc = []
    for i in range(log_probs.shape[0]):
        acc.append(log_probs[i, : il[i]])
    acc = np.concatenate(acc, axis=0)
    ref = torch.logsumexp(torch.from_numpy(acc), dim=0).numpy()
    np.testing.assert_allclose(np.asarray(prior_sum), ref, atol=1e-4)
    # applying priors changes the loss
    priors = jctc.update_log_priors(prior_sum, jnp.log(n_frames.astype(jnp.float32)))
    loss2, _, _ = jctc.ctc_loss_with_priors(
        jnp.asarray(log_probs), jnp.asarray(targets),
        jnp.asarray(il), jnp.asarray(tl), blank, log_priors=priors,
    )
    assert abs(float(loss) - float(loss2)) > 1e-6


def test_forced_align_matches_torch_greedy_consistency():
    """Viterbi path must be a valid CTC expansion of the target and match
    the brute-force best path on a tiny problem."""
    rng = np.random.default_rng(5)
    t, c, blank = 6, 4, 0
    logits = rng.standard_normal((1, t, c)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    targets = np.array([[1, 2]], dtype=np.int64)
    il = np.array([t])
    tl = np.array([2])
    labels, scores = jctc.forced_align(
        jnp.asarray(log_probs), jnp.asarray(targets),
        jnp.asarray(il), jnp.asarray(tl), blank,
    )
    labels = np.asarray(labels)[0]
    # brute force over all valid state paths
    import itertools

    ext = [blank, 1, blank, 2, blank]
    best_score, best_path = -np.inf, None
    def valid_transition(s0, s1):
        if s1 - s0 in (0, 1):
            return True
        if s1 - s0 == 2 and ext[s1] != blank and ext[s1] != ext[s1 - 2]:
            return True
        return False

    for path in itertools.product(range(5), repeat=t):
        if path[0] not in (0, 1) or path[-1] not in (3, 4):
            continue
        if any(not valid_transition(path[i], path[i + 1]) for i in range(t - 1)):
            continue
        score = sum(log_probs[0, i, ext[path[i]]] for i in range(t))
        if score > best_score:
            best_score, best_path = score, path
    expected = np.array([ext[s] for s in best_path])
    np.testing.assert_array_equal(labels, expected)
    # scores are the per-frame emissions of the chosen labels
    np.testing.assert_allclose(
        np.asarray(scores)[0].sum(), best_score, atol=1e-4
    )


def test_forced_align_durations_sum_to_length():
    log_probs, targets, il, tl, blank = _random_problem(6, b=2, t=30, c=9, blank=8)
    targets = np.clip(targets, 0, 7)
    labels, _ = jctc.forced_align(
        jnp.asarray(log_probs), jnp.asarray(targets),
        jnp.asarray(il), jnp.asarray(tl), 8,
    )
    labels = np.asarray(labels)
    for i in range(2):
        seq = labels[i, : il[i]]
        # collapse repeats + blanks must equal the target
        collapsed = []
        prev = None
        for s in seq:
            if s != 8 and s != prev:
                collapsed.append(s)
            prev = s
        assert collapsed == list(targets[i, : tl[i]])
