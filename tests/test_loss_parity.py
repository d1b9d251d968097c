"""Loss-function parity vs the torch reference (train/losses.py): the
spectral/phase/GAN/KL/duration loss math that shapes training dynamics."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stylish_tts_tpu import losses as L  # noqa: E402

from torch_ref import install_reference  # noqa: E402

install_reference()


def _rng(seed):
    return np.random.default_rng(seed)


def test_spectral_convergence_parity():
    from stylish_tts.train.losses import MultiResolutionSTFTLoss

    ref = MultiResolutionSTFTLoss(sample_rate=24000)
    r = _rng(0)
    targets = [r.random((2, 128, 30)).astype(np.float32) for _ in range(3)]
    preds = [r.random((2, 128, 30)).astype(np.float32) for _ in range(3)]
    want = sum(
        float(ref.spectral_convergence_loss(torch.tensor(t), torch.tensor(p)))
        for t, p in zip(targets, preds)
    ) / 3.0
    got = float(
        L.multi_resolution_stft_loss(
            [jnp.asarray(t) for t in targets], [jnp.asarray(p) for p in preds]
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_differential_phase_loss_parity():
    from stylish_tts.train.losses import differential_phase_loss as ref_fn

    r = _rng(1)
    # torch layout [B, F, T]; ours channels-last [B, T, F]
    pred = (np.pi * (2 * r.random((2, 31, 24)) - 1)).astype(np.float32)
    target = (np.pi * (2 * r.random((2, 31, 24)) - 1)).astype(np.float32)
    want = float(ref_fn(torch.tensor(pred), torch.tensor(target), 60))
    got = float(
        L.differential_phase_loss(
            jnp.asarray(pred.transpose(0, 2, 1)),
            jnp.asarray(target.transpose(0, 2, 1)),
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4)


def _fake_scores(seed, n=3):
    r = _rng(seed)
    real = [r.standard_normal((2, 40)).astype(np.float32) for _ in range(n)]
    gen = [r.standard_normal((2, 40)).astype(np.float32) for _ in range(n)]
    return real, gen


def test_discriminator_loss_parity():
    from stylish_tts.train.losses import DiscriminatorLossHelper

    helper = DiscriminatorLossHelper(None, sub_count=3)
    real, gen = _fake_scores(2)
    tr = [torch.tensor(x) for x in real]
    tg = [torch.tensor(x) for x in gen]
    want = float(helper.discriminator_loss(tr, tg) + helper.tprls_loss(tr, tg))
    want_plain = float(helper.discriminator_loss(tr, tg))
    total, plain = L.discriminator_loss(
        [jnp.asarray(x) for x in real], [jnp.asarray(x) for x in gen]
    )
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    np.testing.assert_allclose(float(plain), want_plain, rtol=1e-5)


def test_generator_loss_parity():
    from stylish_tts.train.losses import GeneratorLossHelper

    helper = GeneratorLossHelper(None)
    real, gen = _fake_scores(3)
    r = _rng(4)
    feats_r = [[r.standard_normal((2, 8, 5)).astype(np.float32)
                for _ in range(4)] for _ in range(3)]
    feats_g = [[r.standard_normal((2, 8, 5)).astype(np.float32)
                for _ in range(4)] for _ in range(3)]
    tr = [torch.tensor(x) for x in real]
    tg = [torch.tensor(x) for x in gen]
    tfr = [[torch.tensor(x) for x in f] for f in feats_r]
    tfg = [[torch.tensor(x) for x in f] for f in feats_g]
    want = float(
        helper.generator_loss(tg)
        + helper.feature_loss(tfr, tfg)
        + helper.tprls_loss(tr, tg)
    )
    got = float(
        L.generator_adversarial_loss(
            [jnp.asarray(x) for x in real],
            [jnp.asarray(x) for x in gen],
            [[jnp.asarray(x) for x in f] for f in feats_r],
            [[jnp.asarray(x) for x in f] for f in feats_g],
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_disc_lr_multiplier_parity():
    from stylish_tts.train.losses import DiscriminatorLossHelper

    helper = DiscriminatorLossHelper(None, sub_count=3)
    for last in (0.1, 1.2, 1.45, 1.5, 1.55, 1.62, 3.0, 6.0):
        helper.last_loss = last
        want = helper.get_disc_lr_multiplier()
        got = float(L.disc_lr_multiplier(jnp.asarray(last), sub_count=3))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=str(last))


def test_kl_losses_parity():
    from stylish_tts.train.losses import kl_loss as ref_kl
    from stylish_tts.train.losses import kl_loss_normal as ref_kln

    r = _rng(5)
    shape = (2, 16, 20)  # torch [B, H, T]
    args = [r.standard_normal(shape).astype(np.float32) for _ in range(4)]
    mask = np.ones((2, 1, 20), np.float32)
    args_j = [jnp.asarray(a.transpose(0, 2, 1)) for a in args]  # -> [B,T,H]
    want = float(ref_kl(*[torch.tensor(a) for a in args], torch.tensor(mask)))
    got = float(L.kl_loss(*args_j))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    want = float(ref_kln(*[torch.tensor(a) for a in args], torch.tensor(mask)))
    got = float(L.kl_loss_normal(*args_j))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_duration_loss_parity():
    from stylish_tts.train.losses import DurationLoss

    r = _rng(6)
    b, t, c = 3, 12, 16
    pred = r.standard_normal((b, t, c)).astype(np.float32)
    target = r.integers(0, c, size=(b, t))
    lengths = np.array([12, 9, 5])
    weight = (0.5 + r.random(c)).astype(np.float32)
    ref = DurationLoss(class_count=c, weight=torch.tensor(weight))
    ce_t, cdw_t = ref(
        torch.tensor(pred), torch.tensor(target), torch.tensor(lengths)
    )
    ce_j, cdw_j = L.duration_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(lengths),
        jnp.asarray(weight),
    )
    np.testing.assert_allclose(float(ce_j), float(ce_t), rtol=1e-4)
    np.testing.assert_allclose(float(cdw_j), float(cdw_t), rtol=1e-4)
