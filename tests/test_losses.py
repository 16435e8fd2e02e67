"""Golden-value tests for loss semantics (SURVEY §7 build step 1).

Reference semantics under test: sum-over-voxels / mean-over-batch recon
(utils/my_trainer.py:62-78), per-sample analytic KL (:38-48), expELBO terms
(:278-279), lossE/lossD assembly (:282-284, :319-321), and lossf.py combos.
Golden values are computed with independent numpy formulas.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sivae_tpu.ops import (
    calc_kl,
    calc_reconstruction_loss,
    kld_loss,
    mse_loss,
    normal_loss,
    soft_intro_decoder_loss,
    soft_intro_encoder_loss,
)
from sivae_tpu.ops.losses import exp_elbo

RNG = np.random.RandomState(0)


def test_recon_loss_none_matches_numpy():
    x = RNG.randn(4, 5, 6, 7, 1).astype(np.float32)
    y = RNG.randn(4, 5, 6, 7, 1).astype(np.float32)
    got = calc_reconstruction_loss(jnp.array(x), jnp.array(y), reduction="none")
    want = ((x - y) ** 2).reshape(4, -1).sum(axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_recon_loss_mean_is_batch_mean_of_per_sample_sums():
    x = RNG.randn(3, 10).astype(np.float32)
    y = RNG.randn(3, 10).astype(np.float32)
    got = calc_reconstruction_loss(jnp.array(x), jnp.array(y), reduction="mean")
    want = ((x - y) ** 2).sum(axis=1).mean()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_kl_closed_form():
    # KL(N(mu, sigma^2) || N(0,1)) per dim = -0.5*(1 + logvar - mu^2 - e^logvar)
    mu = RNG.randn(4, 8).astype(np.float32)
    logvar = RNG.randn(4, 8).astype(np.float32) * 0.3
    want = (-0.5 * (1 + logvar - mu**2 - np.exp(logvar))).sum(axis=1)
    got = calc_kl(jnp.array(logvar), jnp.array(mu), reduce="none")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
    np.testing.assert_allclose(
        float(calc_kl(jnp.array(logvar), jnp.array(mu), reduce="mean")),
        want.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(calc_kl(jnp.array(logvar), jnp.array(mu), reduce="sum")),
        want.sum(), rtol=1e-5)


def test_kl_zero_at_standard_normal():
    mu = jnp.zeros((2, 16))
    logvar = jnp.zeros((2, 16))
    assert float(calc_kl(logvar, mu, reduce="mean")) == pytest.approx(0.0, abs=1e-6)


def test_kl_accepts_spatial_latents():
    # Spatial (B, d, h, w, 1) latents must be flattened per sample.
    mu = RNG.randn(2, 3, 4, 5, 1).astype(np.float32)
    logvar = np.zeros_like(mu)
    want = (0.5 * (mu.reshape(2, -1) ** 2)).sum(axis=1)
    got = calc_kl(jnp.array(logvar), jnp.array(mu), reduce="none")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_normal_loss_weighted_combo():
    x = RNG.randn(2, 9).astype(np.float32)
    xh = RNG.randn(2, 9).astype(np.float32)
    mu = RNG.randn(2, 4).astype(np.float32)
    lv = RNG.randn(2, 4).astype(np.float32)
    loss, mse, kld = normal_loss(jnp.array(xh), jnp.array(mu), jnp.array(lv),
                                 jnp.array(x), msew=1.0, kldw=10.0)
    np.testing.assert_allclose(float(mse), float(mse_loss(jnp.array(xh), jnp.array(x))))
    np.testing.assert_allclose(float(kld), 10.0 * float(kld_loss(jnp.array(mu), jnp.array(lv))), rtol=1e-6)
    np.testing.assert_allclose(float(loss), float(mse) + float(kld), rtol=1e-6)


def test_exp_elbo_value_and_underflow():
    rec = np.array([1.0, 2.0], dtype=np.float32)
    kl = np.array([0.5, 1.0], dtype=np.float32)
    s, br, bn = 0.01, 1.0, 4.0
    want = np.exp(-2 * s * (br * rec + bn * kl)).mean()
    got = exp_elbo(jnp.array(rec), jnp.array(kl), scale=s, beta_rec=br, beta_neg=bn)
    np.testing.assert_allclose(float(got), want, rtol=1e-6)
    # the beta_neg=1024 regime must underflow to 0.0, not NaN
    big = exp_elbo(jnp.array(rec) * 1e6, jnp.array(kl) * 1e6,
                   scale=8 / 614400, beta_rec=1.0, beta_neg=1024.0)
    assert float(big) == 0.0


def test_encoder_loss_assembly():
    s = 8 / 614400
    lossE, ef, er = soft_intro_encoder_loss(
        loss_rec=jnp.float32(100.0), kl_real=jnp.float32(3.0),
        loss_fake_rec=jnp.array([10.0, 20.0]), loss_rec_rec=jnp.array([5.0, 5.0]),
        fake_kl=jnp.array([1.0, 2.0]), rec_kl=jnp.array([0.5, 0.5]),
        scale=s, beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
        exp_elbo_weight=0.5, loss_multiplier=10.0,
    )
    want_ef = np.exp(-2 * s * (np.array([10.0, 20.0]) + 1024 * np.array([1.0, 2.0]))).mean()
    want_er = np.exp(-2 * s * (np.array([5.0, 5.0]) + 1024 * np.array([0.5, 0.5]))).mean()
    want = 10.0 * (s * (100.0 + 0.75 * 3.0) + 0.5 * (want_ef + want_er))
    np.testing.assert_allclose(float(ef), want_ef, rtol=1e-5)
    np.testing.assert_allclose(float(er), want_er, rtol=1e-5)
    np.testing.assert_allclose(float(lossE), want, rtol=1e-5)


def test_decoder_loss_assembly():
    s = 8 / 614400
    lossD = soft_intro_decoder_loss(
        loss_rec=jnp.float32(100.0), rec_kl=jnp.float32(2.0), fake_kl=jnp.float32(4.0),
        loss_rec_rec=jnp.float32(50.0), loss_fake_rec=jnp.float32(60.0),
        scale=s, beta_rec=1.0, beta_kl=0.75, gamma_r=1e-8, loss_multiplier=10.0,
    )
    want = 10.0 * s * (100.0 + 0.5 * 0.75 * 6.0 + 1e-8 * 0.5 * 110.0)
    np.testing.assert_allclose(float(lossD), want, rtol=1e-6)


def test_losses_fp32_even_for_bf16_inputs():
    x = jnp.ones((2, 8), dtype=jnp.bfloat16)
    y = jnp.zeros((2, 8), dtype=jnp.bfloat16)
    out = calc_reconstruction_loss(x, y, reduction="mean")
    assert out.dtype == jnp.float32
    assert float(out) == 8.0


def test_calc_kl_general_matches_standard_at_unit_prior():
    from sivae_tpu.ops.losses import calc_kl_general

    mu = RNG.randn(3, 6).astype(np.float32)
    lv = RNG.randn(3, 6).astype(np.float32) * 0.2
    std = calc_kl(jnp.array(lv), jnp.array(mu), reduce="none")
    gen = calc_kl_general(jnp.array(lv), jnp.array(mu), 0.0, 0.0, reduce="none")
    np.testing.assert_allclose(np.asarray(gen), np.asarray(std), rtol=1e-5)
    # KL(p || p) == 0 for matching prior
    same = calc_kl_general(jnp.array(lv), jnp.array(mu),
                           jnp.array(mu), jnp.array(lv), reduce="mean")
    assert abs(float(same)) < 1e-5


def test_localized_loss_matches_reference_formula():
    """models/lossf.py:26-31: loss = mse*msew + kld*kldw +
    mean_b(sum_dim1(localize_loss)) * localizew. Golden vs the torch
    reference implementation when mounted, else the hand formula."""
    from sivae_tpu.ops.losses import localized_loss

    x = RNG.randn(2, 9).astype(np.float32)
    xh = RNG.randn(2, 9).astype(np.float32)
    mu = RNG.randn(2, 4).astype(np.float32)
    lv = RNG.randn(2, 4).astype(np.float32)
    loc_in = RNG.randn(2, 3).astype(np.float32)
    loss, mse, kld, loc = localized_loss(
        jnp.array(xh), jnp.array(mu), jnp.array(lv), jnp.array(loc_in),
        jnp.array(x), msew=2.0, kldw=3.0, localizew=0.5)
    want_loc = loc_in.sum(axis=1).mean() * 0.5
    np.testing.assert_allclose(float(loc), want_loc, rtol=1e-6)
    np.testing.assert_allclose(float(loss), float(mse) + float(kld) + want_loc,
                               rtol=1e-6)
    try:
        import sys

        import torch

        sys.path.insert(0, "/root/reference")
        import models.lossf as ref_lossf
    except Exception:
        pytest.skip("torch/reference unavailable for cross-check")
    t = ref_lossf.localized_loss(
        torch.tensor(xh), torch.tensor(mu), torch.tensor(lv),
        torch.tensor(loc_in), torch.tensor(x), msew=2.0, kldw=3.0,
        localizew=0.5)
    np.testing.assert_allclose(float(loss), float(t[0]), rtol=1e-5)
    np.testing.assert_allclose(float(loc), float(t[3]), rtol=1e-5)
