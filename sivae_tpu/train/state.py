"""Training state: one pytree holding everything needed to resume.

The reference checkpoints only model weights (optimizer state is lost on
restart, SURVEY §5 "Checkpoint / resume"). Here the state is a single
pytree — params for encoder+decoder, both Adam states, BN running stats,
the PRNG key and the step counter — so checkpoint/resume is exact.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from sivae_tpu.config import OptimConfig


@flax.struct.dataclass
class SIVAETrainState:
    enc_params: Any
    dec_params: Any
    enc_stats: Any          # BatchNorm running stats (encoder)
    dec_stats: Any          # BatchNorm running stats (decoder)
    opt_e: Any              # optax state for the encoder optimizer
    opt_d: Any              # optax state for the decoder optimizer
    rng: jax.Array
    step: jax.Array         # int32 global step


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam with MultiStep LR decay (reference my_trainer.py:183-186:
    Adam(2e-4) + MultiStepLR(milestones=(350,), gamma=0.1), per-epoch)."""
    boundaries = {int(m) * steps_per_epoch: cfg.gamma for m in cfg.milestones}
    schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    return optax.adam(schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)


def create_train_state(
    model,
    rng: jax.Array,
    sample_x: jnp.ndarray,
    optim_cfg: OptimConfig = OptimConfig(),
    steps_per_epoch: int = 1,
    joint_optimizer: bool = False,
) -> SIVAETrainState:
    """joint_optimizer=True initializes opt_e over the (enc, dec) tuple for
    the single-optimizer VAE/CAE trainers (reference my_trainer.py:573,778);
    opt_d is unused in that mode."""
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, sample_x)
    enc_params = variables["enc"]["params"]
    dec_params = variables["dec"]["params"]
    enc_stats = variables["enc"].get("batch_stats", {})
    dec_stats = variables["dec"].get("batch_stats", {})
    opt = make_optimizer(optim_cfg, steps_per_epoch)
    if joint_optimizer:
        opt_e = opt.init((enc_params, dec_params))
        opt_d = ()
    else:
        opt_e = opt.init(enc_params)
        opt_d = opt.init(dec_params)
    return SIVAETrainState(
        enc_params=enc_params,
        dec_params=dec_params,
        enc_stats=enc_stats,
        dec_stats=dec_stats,
        opt_e=opt_e,
        opt_d=opt_d,
        rng=state_rng,
        step=jnp.zeros((), jnp.int32),
    )


def param_count(state: SIVAETrainState) -> int:
    leaves = jax.tree_util.tree_leaves((state.enc_params, state.dec_params))
    return sum(int(x.size) for x in leaves)
