"""Functional losses for VAE / Soft-IntroVAE training.

Semantics match the reference exactly (verified by golden tests):

- reconstruction: squared error **summed over voxels per sample**, then
  optionally **mean over the batch** (reference utils/my_trainer.py:62-78,
  models/lossf.py:5-12).
- KL: analytic KL(N(mu, sigma) || N(0, I)) summed over latent dims per
  sample, then optionally batch-mean (my_trainer.py:38-48, lossf.py:14-18).
- Soft-IntroVAE encoder/decoder objectives incl. the expELBO terms
  (my_trainer.py:260-321).

All reductions are computed in float32 regardless of the activation dtype:
the expELBO term exponentiates `-2*s*(beta_rec*rec + 1024*kl)` which
underflows quickly, so fp32 accumulation is load-bearing on TPU where conv
outputs may be bfloat16.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def _flatten_per_sample(x: Array) -> Array:
    return jnp.reshape(x, (x.shape[0], -1)).astype(jnp.float32)


def calc_reconstruction_loss(x: Array, recon_x: Array, reduction: str = "none") -> Array:
    """Sum-of-squares over voxels per sample; batch-mean iff reduction='mean'.

    Parity with reference utils/my_trainer.py:62-78 (`calc_reconstruction_loss`).
    """
    x = _flatten_per_sample(x)
    recon_x = _flatten_per_sample(recon_x)
    per_sample = jnp.sum((x - recon_x) ** 2, axis=1)
    if reduction == "mean":
        return jnp.mean(per_sample)
    return per_sample


def calc_kl(logvar: Array, mu: Array, reduce: str = "none") -> Array:
    """Analytic KL to N(0, I): per-sample sum over latent dims.

    Parity with reference utils/my_trainer.py:38-48 (`calc_kl`); argument
    order (logvar, mu) kept for citation clarity.
    """
    mu = _flatten_per_sample(mu)
    logvar = _flatten_per_sample(logvar)
    kl = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    if reduce == "mean":
        return jnp.mean(kl)
    if reduce == "sum":
        return jnp.sum(kl)
    return kl


def calc_kl_general(
    logvar: Array, mu: Array,
    mu_o: Array | float = 0.0, logvar_o: Array | float = 0.0,
    reduce: str = "none",
) -> Array:
    """KL(N(mu, e^logvar) || N(mu_o, e^logvar_o)) — the generalized form from
    the DataParallel trainer (reference main_DataParallel.py:87-98)."""
    mu = _flatten_per_sample(mu)
    logvar = _flatten_per_sample(logvar)
    mu_o = jnp.asarray(mu_o, jnp.float32)
    logvar_o = jnp.asarray(logvar_o, jnp.float32)
    if mu_o.ndim > 1:
        mu_o = jnp.reshape(mu_o, (mu_o.shape[0], -1))
    if logvar_o.ndim > 1:
        logvar_o = jnp.reshape(logvar_o, (logvar_o.shape[0], -1))
    kl = -0.5 * jnp.sum(
        1.0 + logvar - logvar_o - (mu - mu_o) ** 2 * jnp.exp(-logvar_o)
        - jnp.exp(logvar - logvar_o), axis=1)
    if reduce == "mean":
        return jnp.mean(kl)
    if reduce == "sum":
        return jnp.sum(kl)
    return kl


def calc_kl_per_position(logvar: Array, mu: Array, reduce: str = "none") -> Array:
    """KL summed over the CHANNEL axis only — the DataParallel trainer's
    calc_kl (reference main_DataParallel.py:87-98) never flattens: its
    `.sum(1)` hits the SINGLETON channel of the conv latent (B,1,5,6,5),
    so the result is PER-POSITION KL of shape (B,5,6,5). reduce='mean'
    therefore divides by B*5*6*5 (not B), and reduce='none' feeds a
    per-position tensor into expELBO's mean. Channel-last here, so the
    sum runs over axis -1.
    """
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    if reduce == "mean":
        return jnp.mean(kl)
    if reduce == "sum":
        return jnp.sum(kl)
    return kl


# --- plain-VAE losses (reference models/lossf.py) --------------------------


def mse_loss(out: Array, x: Array) -> Array:
    """models/lossf.py:5-12 — sum over voxels, mean over batch."""
    return calc_reconstruction_loss(x, out, reduction="mean")


def kld_loss(mu: Array, logvar: Array) -> Array:
    """models/lossf.py:14-18."""
    return calc_kl(logvar, mu, reduce="mean")


def normal_loss(
    x_hat: Array, mu: Array, logvar: Array, x: Array, msew: float = 1.0, kldw: float = 10.0
) -> Tuple[Array, Array, Array]:
    """models/lossf.py:20-24 — weighted ELBO for the plain ResNetVAE path."""
    mse = mse_loss(x_hat, x) * msew
    kld = kld_loss(mu, logvar) * kldw
    return mse + kld, mse, kld


def localized_loss(
    x_hat: Array, mu: Array, logvar: Array, localize_loss: Array, x: Array,
    msew: float = 1.0, kldw: float = 1.0, localizew: float = 1.0,
) -> Tuple[Array, Array, Array, Array]:
    """models/lossf.py:26-31 — ELBO plus an externally-supplied per-sample
    localization term (sum over dim 1, mean over batch). Dead code in the
    reference (defined, never called); ported for completeness."""
    mse = mse_loss(x_hat, x) * msew
    kld = kld_loss(mu, logvar) * kldw
    loc = jnp.mean(jnp.sum(localize_loss.astype(jnp.float32), axis=1)) * localizew
    return mse + kld + loc, mse, kld, loc


# --- Soft-IntroVAE objectives ----------------------------------------------


def exp_elbo(rec_per_sample: Array, kl_per_sample: Array, *, scale: float,
             beta_rec: float, beta_neg: float) -> Array:
    """mean_b exp(-2 s (beta_rec * rec_b + beta_neg * kl_b)).

    Reference my_trainer.py:278-279. Computed in fp32; the argument of exp is
    large-negative for confident fakes so this underflows gracefully to 0.
    """
    arg = -2.0 * scale * (beta_rec * rec_per_sample + beta_neg * kl_per_sample)
    return jnp.mean(jnp.exp(arg.astype(jnp.float32)))


def soft_intro_encoder_loss(
    *,
    loss_rec: Array,          # scalar: recon(real, rec), batch-mean
    kl_real: Array,           # scalar: KL of real batch, batch-mean
    loss_fake_rec: Array,     # per-sample recon(fake, rec_fake)
    loss_rec_rec: Array,      # per-sample recon(rec, rec_rec)
    fake_kl: Array,           # per-sample KL of re-encoded fake
    rec_kl: Array,            # per-sample KL of re-encoded rec
    scale: float,
    beta_rec: float,
    beta_neg: float,
    beta_kl: float,
    exp_elbo_weight: float = 0.5,
    loss_multiplier: float = 10.0,
) -> Tuple[Array, Array, Array]:
    """Encoder (discriminator-side) loss — reference my_trainer.py:278-284.

    Returns (lossE, exp_elbo_fake, exp_elbo_rec).
    """
    e_fake = exp_elbo(loss_fake_rec, fake_kl, scale=scale, beta_rec=beta_rec, beta_neg=beta_neg)
    e_rec = exp_elbo(loss_rec_rec, rec_kl, scale=scale, beta_rec=beta_rec, beta_neg=beta_neg)
    lossE = scale * (beta_rec * loss_rec + beta_kl * kl_real) + exp_elbo_weight * (e_fake + e_rec)
    return lossE * loss_multiplier, e_fake, e_rec


def soft_intro_decoder_loss(
    *,
    loss_rec: Array,       # scalar recon(real, rec)
    rec_kl: Array,         # scalar KL of re-encoded rec
    fake_kl: Array,        # scalar KL of re-encoded fake
    loss_rec_rec: Array,   # scalar recon(rec, rec_rec)
    loss_fake_rec: Array,  # scalar recon(fake, rec_fake)
    scale: float,
    beta_rec: float,
    beta_kl: float,
    gamma_r: float,
    loss_multiplier: float = 10.0,
) -> Array:
    """Decoder (generator-side) loss — reference my_trainer.py:319-321."""
    lossD = scale * (
        beta_rec * loss_rec
        + 0.5 * beta_kl * (rec_kl + fake_kl)
        + gamma_r * 0.5 * beta_rec * (loss_rec_rec + loss_fake_rec)
    )
    return lossD * loss_multiplier
