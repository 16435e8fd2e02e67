"""Jitted train/eval steps.

The flagship is the Soft-IntroVAE two-phase adversarial step. The reference
runs it eagerly per batch — >=5 encoder + >=7 decoder forwards and two
backward graphs with `requires_grad` flag-flipping and `.detach()` at precise
points (reference utils/my_trainer.py:234-324). Here the whole thing is ONE
jitted function:

- phase E: `jax.value_and_grad` w.r.t. encoder params only — the decoder is
  a closed-over constant, which IS the requires_grad freeze;
- phase D: same w.r.t. decoder params, using the *updated* encoder (the
  torch code steps optimizer_e before building the decoder graph);
- every `.detach()` becomes `jax.lax.stop_gradient` at the same place;
- BatchNorm running stats are threaded functionally through all 12 forward
  passes in the reference's execution order;
- all losses accumulate in fp32 even when conv activations are bf16.

Gradient-flow topology notes (the correctness-critical bits):
- phase E `loss_rec_rec = recon(rec, rec_rec)` uses the NON-detached `rec`
  as the target (my_trainer.py:275) — encoder grads flow through the target;
- phase E re-encodes stop_gradient(rec/fake) but the resampled z_rec/z_fake
  are NOT detached before the inner decode (model.forward, my_trainer.py:266);
- phase D detaches z, z_rec, z_fake and the recon targets (my_trainer.py:
  298, 310-314) but the KL terms flow dec->decode->encode activations.

The functions here are deliberately pure and mesh-agnostic: data parallelism
comes from the caller placing `batch` with a `NamedSharding(P("data"))` and
replicating the state — XLA then inserts the gradient psums over ICI
(see sivae_tpu/parallel/mesh.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.lax import stop_gradient as sg

from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
from sivae_tpu.ops.losses import (
    calc_kl,
    calc_kl_per_position,
    calc_reconstruction_loss,
    normal_loss,
    soft_intro_decoder_loss,
    soft_intro_encoder_loss,
)
from sivae_tpu.models.resnet_vae import reparameterize
from sivae_tpu.train.state import SIVAETrainState, make_optimizer

Array = jnp.ndarray
Metrics = Dict[str, Array]


class _CheckpointedCalls:
    """Wraps train-mode encode/decode in jax.checkpoint(nothing_saveable).

    Function-level rematerialization: only each call's inputs/outputs stay
    live across the step's 12 forwards, halving activation memory vs
    block-level remat (batch 16 fits on one v5e chip; block remat OOMs).
    Use with model cfg.remat=False to avoid double recompute.
    """

    def __init__(self, model, policy: str | None = None):
        self._m = model
        self.latent_shape = model.latent_shape
        self.latent_dim = model.latent_dim
        if policy is None:
            pol = jax.checkpoint_policies.nothing_saveable
        else:
            from sivae_tpu.models.blocks import remat_policy_by_name

            pol = remat_policy_by_name(policy)
        self._enc = jax.checkpoint(
            lambda ev, x, key: model.encode(ev, x, train=True, dropout_rng=key),
            policy=pol)
        self._dec = jax.checkpoint(
            lambda dv, z, key: model.decode(dv, z, train=True, dropout_rng=key),
            policy=pol)

    def encode(self, ev, x, train=False, dropout_rng=None):
        if train:
            return self._enc(ev, x, dropout_rng)
        return self._m.encode(ev, x, train=False, dropout_rng=dropout_rng)

    def decode(self, dv, z, train=False, dropout_rng=None):
        if train:
            return self._dec(dv, z, dropout_rng)
        return self._m.decode(dv, z, train=False, dropout_rng=dropout_rng)


def make_soft_intro_train_step(
    model,
    loss_cfg: SoftIntroLossConfig,
    optim_cfg: OptimConfig,
    steps_per_epoch: int,
    input_shape: Tuple[int, int, int],
    remat_calls: bool = False,
    remat_calls_policy: str | None = None,
    zero_noise: bool = False,
    fixed_noise: Optional[Array] = None,
    share_phase_d_dropout_keys: bool = True,
) -> Callable[[SIVAETrainState, Array], Tuple[SIVAETrainState, Metrics]]:
    """Build the two-phase Soft-IntroVAE step. jit it with donate_argnums=(0,).

    remat_calls=True checkpoints whole encode/decode calls (use with
    cfg.remat=False): lower memory, ~5% slower at batch 8, unlocks batch 16.

    zero_noise=True makes the step fully deterministic (noise batch = 0,
    every reparameterize returns mu) — test support for gradient-topology
    parity against the torch reference; never use for real training.

    fixed_noise (a (batch,)+latent_shape constant) replaces the random
    noise batch while keeping the reparam eps behavior from zero_noise —
    oracle-parity support: a ZERO noise batch makes the fake-decode path
    constant per channel, so every BN on it sees batch var = 0 and
    gradients through it are fp noise amplified by 1/sqrt(bn_eps) per BN
    layer (measured: torch grad 2.9e3 vs ours 0.7 on the deepest decoder
    BN beta — framework-specific noise, no parity signal). A fixed
    NONZERO batch keeps the path non-degenerate and the comparison sharp.

    share_phase_d_dropout_keys=True (default, +3% throughput) reuses phase
    E's dropout keys for phase D's decode(noise)/decode(z) so XLA can CSE
    the value-identical forwards. The reference redraws masks per forward
    (my_trainer.py:297-298); sharing correlates the E/D mask pairing within
    one step (each phase's dropout-gradient estimator is unchanged in
    distribution) — a documented training-semantics deviation
    (docs/COVERAGE.md). Set False for strict-parity mask scheduling.
    """

    scale = loss_cfg.resolved_scale(input_shape)
    opt = make_optimizer(optim_cfg, steps_per_epoch)
    if remat_calls:
        model = _CheckpointedCalls(model, remat_calls_policy)
    eps0 = 0.0 if zero_noise else None
    dp = loss_cfg.dp_semantics
    _kl = calc_kl_per_position if dp else calc_kl

    def _reparam(key, mu, logvar):
        return reparameterize(key, mu, logvar, val_eps=eps0)

    def train_step(state: SIVAETrainState, real: Array) -> Tuple[SIVAETrainState, Metrics]:
        rng, k_noise, k_z, k_zrec, k_zfake, k_dzrec, k_dzfake = jax.random.split(state.rng, 7)
        # dropout keys: one per forward pass that has dropout
        dkeys = jax.random.split(rng, 14)
        rng_next = dkeys[13]
        b = real.shape[0]
        noise = jax.random.normal(k_noise, (b,) + tuple(model.latent_shape), jnp.float32)
        if fixed_noise is not None:
            noise = jnp.asarray(fixed_noise, jnp.float32).reshape(noise.shape)
        elif zero_noise:
            noise = jnp.zeros_like(noise)

        # ============ Phase E: update encoder ============ (my_trainer.py:241-288)
        def lossE_fn(enc_params):
            ev = {"params": enc_params, "batch_stats": state.enc_stats}
            dv = {"params": state.dec_params, "batch_stats": state.dec_stats}
            fake, dv = model.decode(dv, noise, train=True, dropout_rng=dkeys[0])
            (real_mu, real_logvar), ev = model.encode(ev, real, train=True, dropout_rng=dkeys[1])
            z = _reparam(k_z, real_mu, real_logvar)
            rec, dv = model.decode(dv, z, train=True, dropout_rng=dkeys[2])

            loss_rec = calc_reconstruction_loss(real, rec, reduction="mean")
            kl_real = _kl(real_logvar, real_mu, "mean")

            # model.forward(rec.detach()) / model.forward(fake.detach())
            (rec_mu, rec_logvar), ev = model.encode(ev, sg(rec), train=True, dropout_rng=dkeys[3])
            z_rec = _reparam(k_zrec, rec_mu, rec_logvar)
            rec_rec, dv = model.decode(dv, z_rec, train=True, dropout_rng=dkeys[4])
            (fake_mu, fake_logvar), ev = model.encode(ev, sg(fake), train=True, dropout_rng=dkeys[5])
            z_fake = _reparam(k_zfake, fake_mu, fake_logvar)
            rec_fake, dv = model.decode(dv, z_fake, train=True, dropout_rng=dkeys[6])

            fake_kl_e = _kl(fake_logvar, fake_mu, "none")
            rec_kl_e = _kl(rec_logvar, rec_mu, "none")
            # dp_semantics: the DP calc_reconstruction_loss ignores
            # `reduction`, so the expELBO recon terms are batch-mean
            # SCALARS there (main_DataParallel.py:108-116)
            elbo_red = "mean" if dp else "none"
            loss_fake_rec = calc_reconstruction_loss(fake, rec_fake, reduction=elbo_red)
            # NB: target `rec` is NOT detached here (my_trainer.py:275)
            loss_rec_rec = calc_reconstruction_loss(rec, rec_rec, reduction=elbo_red)

            lossE, e_fake, e_rec = soft_intro_encoder_loss(
                loss_rec=loss_rec, kl_real=kl_real,
                loss_fake_rec=loss_fake_rec, loss_rec_rec=loss_rec_rec,
                fake_kl=fake_kl_e, rec_kl=rec_kl_e,
                scale=scale, beta_rec=loss_cfg.beta_rec, beta_neg=loss_cfg.beta_neg,
                beta_kl=loss_cfg.beta_kl, exp_elbo_weight=loss_cfg.exp_elbo_weight,
                loss_multiplier=loss_cfg.loss_multiplier,
            )
            aux = {
                "z": z,
                "enc_stats": ev["batch_stats"],
                "dec_stats": dv["batch_stats"],
                "loss_rec": loss_rec,
                "kl_real": kl_real,
                "exp_elbo_fake": e_fake,
                "exp_elbo_rec": e_rec,
            }
            return lossE, aux

        (lossE, auxE), gradE = jax.value_and_grad(lossE_fn, has_aux=True)(state.enc_params)
        updE, opt_e = opt.update(gradE, state.opt_e, state.enc_params)
        enc_params = optax.apply_updates(state.enc_params, updE)
        enc_stats, dec_stats = auxE["enc_stats"], auxE["dec_stats"]
        z = sg(auxE["z"])

        # ============ Phase D: update decoder ============ (my_trainer.py:290-324)
        # Uses the freshly-updated encoder params, exactly like torch where
        # optimizer_e.step() precedes the decoder graph.
        def lossD_fn(dec_params):
            dv = {"params": dec_params, "batch_stats": dec_stats}
            ev = {"params": enc_params, "batch_stats": enc_stats}
            # Dropout keys (default) deliberately REUSE phase E's
            # dkeys[0]/dkeys[2]: decoder params are unchanged between the
            # phases (optE touches only the encoder) and train-mode BN
            # normalizes by batch stats, so with equal masks these two
            # forwards are value-identical to phase E's decode(noise)/
            # decode(z) and XLA CSEs the whole subgraphs (~6% step time).
            # The reference redraws masks (fresh eager forwards,
            # my_trainer.py:297-298); sharing them within one step only
            # correlates the E/D mask pairing — each phase's dropout-
            # gradient estimator is unchanged in distribution. Documented
            # deviation (docs/COVERAGE.md); share_phase_d_dropout_keys=False
            # restores fresh masks (dkeys[7]/dkeys[8] are reserved for it).
            kd_noise = dkeys[0] if share_phase_d_dropout_keys else dkeys[7]
            kd_z = dkeys[2] if share_phase_d_dropout_keys else dkeys[8]
            fake, dv = model.decode(dv, noise, train=True, dropout_rng=kd_noise)
            rec, dv = model.decode(dv, z, train=True, dropout_rng=kd_z)

            # dp_semantics: the DP trainer detaches rec here
            # (main_DataParallel.py:481) — its decoder gets NO
            # reconstruction gradient from the beta_rec*loss_rec term
            loss_rec = calc_reconstruction_loss(
                real, sg(rec) if dp else rec, reduction="mean")

            (rec_mu, rec_logvar), ev = model.encode(ev, rec, train=True, dropout_rng=dkeys[9])
            z_rec = _reparam(k_dzrec, rec_mu, rec_logvar)
            (fake_mu, fake_logvar), ev = model.encode(ev, fake, train=True, dropout_rng=dkeys[10])
            z_fake = _reparam(k_dzfake, fake_mu, fake_logvar)

            # dp_semantics: the DP trainer does NOT detach z_rec/z_fake
            # before the re-decode (main_DataParallel.py:489-490), unlike
            # my_trainer.py:310-311
            z_rec_d = z_rec if dp else sg(z_rec)
            z_fake_d = z_fake if dp else sg(z_fake)
            rec_rec, dv = model.decode(dv, z_rec_d, train=True, dropout_rng=dkeys[11])
            rec_fake, dv = model.decode(dv, z_fake_d, train=True, dropout_rng=dkeys[12])

            loss_rec_rec = calc_reconstruction_loss(sg(rec), rec_rec, reduction="mean")
            loss_fake_rec = calc_reconstruction_loss(sg(fake), rec_fake, reduction="mean")
            rec_kl = _kl(rec_logvar, rec_mu, "mean")
            fake_kl = _kl(fake_logvar, fake_mu, "mean")

            lossD = soft_intro_decoder_loss(
                loss_rec=loss_rec, rec_kl=rec_kl, fake_kl=fake_kl,
                loss_rec_rec=loss_rec_rec, loss_fake_rec=loss_fake_rec,
                scale=scale, beta_rec=loss_cfg.beta_rec, beta_kl=loss_cfg.beta_kl,
                gamma_r=loss_cfg.gamma_r, loss_multiplier=loss_cfg.loss_multiplier,
            )
            aux = {
                "enc_stats": ev["batch_stats"],
                "dec_stats": dv["batch_stats"],
                "loss_rec": loss_rec,
                "rec_kl": rec_kl,
                "fake_kl": fake_kl,
            }
            return lossD, aux

        (lossD, auxD), gradD = jax.value_and_grad(lossD_fn, has_aux=True)(state.dec_params)
        updD, opt_d = opt.update(gradD, state.opt_d, state.dec_params)
        dec_params = optax.apply_updates(state.dec_params, updD)

        new_state = state.replace(
            enc_params=enc_params,
            dec_params=dec_params,
            enc_stats=auxD["enc_stats"],
            dec_stats=auxD["dec_stats"],
            opt_e=opt_e,
            opt_d=opt_d,
            rng=rng_next,
            step=state.step + 1,
        )
        metrics = {
            "lossE": lossE,
            "lossD": lossD,
            "loss_rec": auxD["loss_rec"],
            "kl_real": auxE["kl_real"],
            "rec_kl": auxD["rec_kl"],
            "fake_kl": auxD["fake_kl"],
            "exp_elbo_fake": auxE["exp_elbo_fake"],
            "exp_elbo_rec": auxE["exp_elbo_rec"],
            "diff_kl": auxD["fake_kl"] - auxE["kl_real"],
            # jit-compatible replacement for the eager NaN->SystemError guard
            # (my_trainer.py:327-328); checked host-side once per epoch.
            "nan": jnp.isnan(lossE) | jnp.isnan(lossD),
        }
        return new_state, metrics

    return train_step


def make_soft_intro_eval_step(
    model,
    loss_cfg: SoftIntroLossConfig,
    input_shape: Tuple[int, int, int],
    val_eps: float = 0.1,
    zero_noise: bool = False,
    fixed_noise: Optional[Array] = None,
    val_loss_multiplier: float = 1.0,
) -> Callable[[SIVAETrainState, Array, jax.Array], Metrics]:
    """Validation pass (reference my_trainer.py:385-439): eval mode
    (running BN stats, no dropout), fixed eps=0.1 for the outer real/recon
    reparam, random eps inside `model.forward` on rec/fake — matching the
    reference's mixed usage exactly.

    val_loss_multiplier: the spatial trainer's val loop reports the RAW
    losses (my_trainer.py:411,434 — no x10, unlike its train loop), but
    the FC trainer's val loop keeps the x10 (trainer_fc.py:374,396) — a
    reference-side inconsistency. Pass loss_cfg.loss_multiplier to match
    trainer_fc's val scale (the FC oracle does); default 1.0 matches
    my_trainer.

    zero_noise=True zeroes the noise batch and the two random-eps reparams
    (the fixed val_eps=0.1 ones are untouched) — deterministic test support
    for the golden-oracle val-loss comparison (tests/test_reference_oracle).
    fixed_noise replaces the noise batch with a constant while keeping the
    zero_noise eps behavior (see make_soft_intro_train_step).
    """

    scale = loss_cfg.resolved_scale(input_shape)
    eps0 = 0.0 if zero_noise else None
    dp = loss_cfg.dp_semantics
    _kl = calc_kl_per_position if dp else calc_kl

    def eval_step(state: SIVAETrainState, real: Array, rng: jax.Array) -> Metrics:
        ev = {"params": state.enc_params, "batch_stats": state.enc_stats}
        dv = {"params": state.dec_params, "batch_stats": state.dec_stats}
        k_noise, k_zrec, k_zfake = jax.random.split(rng, 3)
        b = real.shape[0]
        noise = jax.random.normal(k_noise, (b,) + tuple(model.latent_shape), jnp.float32)
        if fixed_noise is not None:
            noise = jnp.asarray(fixed_noise, jnp.float32).reshape(noise.shape)
        elif zero_noise:
            noise = jnp.zeros_like(noise)

        # --- encoder-side metrics ---
        fake, _ = model.decode(dv, noise)
        (real_mu, real_logvar), _ = model.encode(ev, real)
        z = reparameterize(None, real_mu, real_logvar, val_eps=val_eps)
        rec, _ = model.decode(dv, z)
        loss_rec = calc_reconstruction_loss(real, rec, reduction="mean")
        kl_real = _kl(real_logvar, real_mu, "mean")

        (rec_mu, rec_logvar), _ = model.encode(ev, rec)
        z_rec = reparameterize(k_zrec, rec_mu, rec_logvar, val_eps=eps0)  # random eps (forward default)
        rec_rec, _ = model.decode(dv, z_rec)
        (fake_mu, fake_logvar), _ = model.encode(ev, fake)
        z_fake = reparameterize(k_zfake, fake_mu, fake_logvar, val_eps=eps0)
        rec_fake, _ = model.decode(dv, z_fake)

        fake_kl_e = _kl(fake_logvar, fake_mu, "none")
        rec_kl_e = _kl(rec_logvar, rec_mu, "none")
        elbo_red = "mean" if dp else "none"
        loss_fake_rec = calc_reconstruction_loss(fake, rec_fake, reduction=elbo_red)
        loss_rec_rec = calc_reconstruction_loss(rec, rec_rec, reduction=elbo_red)
        lossE, e_fake, e_rec = soft_intro_encoder_loss(
            loss_rec=loss_rec, kl_real=kl_real,
            loss_fake_rec=loss_fake_rec, loss_rec_rec=loss_rec_rec,
            fake_kl=fake_kl_e, rec_kl=rec_kl_e,
            scale=scale, beta_rec=loss_cfg.beta_rec, beta_neg=loss_cfg.beta_neg,
            beta_kl=loss_cfg.beta_kl, exp_elbo_weight=loss_cfg.exp_elbo_weight,
            loss_multiplier=val_loss_multiplier,  # my_trainer val: 1 (:411)
        )

        # --- decoder-side metrics (val uses eps=0.1 reparams, :419-423) ---
        (rec_mu2, rec_logvar2), _ = model.encode(ev, rec)
        z_rec2 = reparameterize(None, rec_mu2, rec_logvar2, val_eps=val_eps)
        (fake_mu2, fake_logvar2), _ = model.encode(ev, fake)
        z_fake2 = reparameterize(None, fake_mu2, fake_logvar2, val_eps=val_eps)
        rec_rec2, _ = model.decode(dv, z_rec2)
        rec_fake2, _ = model.decode(dv, z_fake2)
        loss_rec_rec2 = calc_reconstruction_loss(rec, rec_rec2, reduction="mean")
        loss_fake_rec2 = calc_reconstruction_loss(fake, rec_fake2, reduction="mean")
        rec_kl = _kl(rec_logvar2, rec_mu2, "mean")
        fake_kl = _kl(fake_logvar2, fake_mu2, "mean")
        lossD = soft_intro_decoder_loss(
            loss_rec=loss_rec, rec_kl=rec_kl, fake_kl=fake_kl,
            loss_rec_rec=loss_rec_rec2, loss_fake_rec=loss_fake_rec2,
            scale=scale, beta_rec=loss_cfg.beta_rec, beta_kl=loss_cfg.beta_kl,
            gamma_r=loss_cfg.gamma_r, loss_multiplier=val_loss_multiplier,
        )
        return {
            "lossE": lossE, "lossD": lossD, "loss_rec": loss_rec,
            "kl_real": kl_real, "rec_kl": rec_kl, "fake_kl": fake_kl,
            "exp_elbo_fake": e_fake, "exp_elbo_rec": e_rec,
        }

    return eval_step


# --------------------------------------------------------------------------
# Plain VAE / CAE steps (reference my_trainer.py:557-652, 763-823)
# --------------------------------------------------------------------------


def make_vae_train_step(
    model,
    optim_cfg: OptimConfig,
    steps_per_epoch: int,
    mse_w: float = 1.0,
    kl_w: float = 1.0,
):
    """Single-optimizer ELBO step over all params (train_ResNetVAE :557-652,
    loss = lossf.normal_loss with CLI mse/kl weights, vae_main.py:205)."""

    opt = make_optimizer(optim_cfg, steps_per_epoch)

    def train_step(state: SIVAETrainState, real: Array):
        rng, k_z, k_de, k_dd = jax.random.split(state.rng, 4)

        def loss_fn(params):
            enc_params, dec_params = params
            ev = {"params": enc_params, "batch_stats": state.enc_stats}
            dv = {"params": dec_params, "batch_stats": state.dec_stats}
            (mu, logvar), ev = model.encode(ev, real, train=True, dropout_rng=k_de)
            zz = reparameterize(k_z, mu, logvar)
            x_re, dv = model.decode(dv, zz, train=True, dropout_rng=k_dd)
            loss, mse, kld = normal_loss(x_re, mu, logvar, real, msew=mse_w, kldw=kl_w)
            return loss, {"mse": mse, "kl": kld,
                          "enc_stats": ev["batch_stats"], "dec_stats": dv["batch_stats"]}

        params = (state.enc_params, state.dec_params)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_all = opt.update(grads, state.opt_e, params)
        enc_params, dec_params = optax.apply_updates(params, upd)
        new_state = state.replace(
            enc_params=enc_params, dec_params=dec_params,
            enc_stats=aux["enc_stats"], dec_stats=aux["dec_stats"],
            opt_e=opt_all, rng=rng, step=state.step + 1,
        )
        return new_state, {"loss": loss, "mse": aux["mse"], "kl": aux["kl"],
                           "nan": jnp.isnan(loss)}

    return train_step


def make_vae_eval_step(model, mse_w: float = 1.0, kl_w: float = 10.0):
    """Eval with the default lossf weights (reference :616 calls normal_loss
    with defaults, i.e. kldw=10, regardless of training weights)."""

    def eval_step(state: SIVAETrainState, real: Array, rng: jax.Array):
        ev = {"params": state.enc_params, "batch_stats": state.enc_stats}
        dv = {"params": state.dec_params, "batch_stats": state.dec_stats}
        (mu, logvar), _ = model.encode(ev, real)
        zz = reparameterize(rng, mu, logvar)
        x_re, _ = model.decode(dv, zz)
        loss, mse, kld = normal_loss(x_re, mu, logvar, real, msew=mse_w, kldw=kl_w)
        return {"loss": loss, "mse": mse, "kl": kld}

    return eval_step


def make_classifier_train_step(model, optim_cfg: OptimConfig, steps_per_epoch: int):
    """CrossEntropy classifier step (reference `train`, my_trainer.py:829-910)."""

    opt = make_optimizer(optim_cfg, steps_per_epoch)

    def train_step(state: SIVAETrainState, x: Array, labels: Array):
        rng, k_d = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.enc_stats}
            logits, mut = model.apply(variables, x, train=True,
                                      rngs={"dropout": k_d}, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, (acc, mut["batch_stats"])

        (loss, (acc, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.enc_params)
        upd, opt_state = opt.update(grads, state.opt_e, state.enc_params)
        params = optax.apply_updates(state.enc_params, upd)
        new_state = state.replace(enc_params=params, enc_stats=stats,
                                  opt_e=opt_state, rng=rng, step=state.step + 1)
        return new_state, {"loss": loss, "acc": acc, "nan": jnp.isnan(loss)}

    return train_step


def make_classifier_eval_step(model):
    def eval_step(state: SIVAETrainState, x: Array, labels: Array):
        variables = {"params": state.enc_params, "batch_stats": state.enc_stats}
        logits = model.apply(variables, x, train=False)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        pred = jnp.argmax(logits, -1)
        acc = jnp.mean((pred == labels).astype(jnp.float32))
        return {"loss": loss, "acc": acc}, pred

    return eval_step


def make_cae_train_step(encoder, decoder, optim_cfg: OptimConfig, steps_per_epoch: int):
    """CAE: elementwise-mean MSE (torch nn.MSELoss default, my_trainer.py:777)."""

    opt = make_optimizer(optim_cfg, steps_per_epoch)

    def train_step(state: SIVAETrainState, real: Array):
        rng, k_de, k_dd = jax.random.split(state.rng, 3)

        def loss_fn(params):
            enc_params, dec_params = params
            ev = {"params": enc_params, "batch_stats": state.enc_stats}
            dv = {"params": dec_params, "batch_stats": state.dec_stats}
            z, mut_e = encoder.apply(ev, real, train=True, rngs={"dropout": k_de},
                                     mutable=["batch_stats"])
            out, mut_d = decoder.apply(dv, z, train=True, rngs={"dropout": k_dd},
                                       mutable=["batch_stats"])
            loss = jnp.mean((out.astype(jnp.float32) - real.astype(jnp.float32)) ** 2)
            return loss, (mut_e["batch_stats"], mut_d["batch_stats"])

        params = (state.enc_params, state.dec_params)
        (loss, (es, ds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_all = opt.update(grads, state.opt_e, params)
        enc_params, dec_params = optax.apply_updates(params, upd)
        new_state = state.replace(
            enc_params=enc_params, dec_params=dec_params,
            enc_stats=es, dec_stats=ds, opt_e=opt_all, rng=rng, step=state.step + 1,
        )
        return new_state, {"loss": loss, "nan": jnp.isnan(loss)}

    return train_step
