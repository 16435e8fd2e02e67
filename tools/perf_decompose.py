"""Decompose the two-phase step's time: forward vs backward vs regularizer
cost (dropout RNG, BN train stats). Companion to tools/perf_sweep.py.

Each measurement prints one JSON line. All use the flagship spatial_1200
bf16 config with the conv_outs remat policy unless noted.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, sync, steps, warmup=2):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.data.preprocess import preprocess_batch
    from sivae_tpu.data.synthetic import synthetic_brain_batch
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import (
        make_soft_intro_eval_step,
        make_soft_intro_train_step,
    )

    base = dataclasses.replace(get_model_config("spatial_1200"),
                               dtype=jnp.bfloat16, remat_policy="conv_outs")
    vox, _ = synthetic_brain_batch(args.batch, base.input_shape, seed=0)
    x = preprocess_batch(jax.device_put(vox))
    loss_cfg = SoftIntroLossConfig()

    def setup(cfg):
        model = make_model(cfg)
        state = create_train_state(
            model, jax.random.key(0),
            jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
            OptimConfig(), steps_per_epoch=100)
        return model, state

    def report(name, seconds):
        print(json.dumps({"measure": name, "ms": round(1000 * seconds, 1),
                          "vol_per_sec": round(args.batch / seconds, 2)}),
              flush=True)

    model, state = setup(base)
    # 2. the same 12 train-mode forwards, losses only, NO gradients
    def fwd_only(state, real):
        from jax.lax import stop_gradient as sg

        from sivae_tpu.models.resnet_vae import reparameterize
        from sivae_tpu.ops.losses import calc_kl, calc_reconstruction_loss

        rng = state.rng
        dkeys = jax.random.split(rng, 14)
        b = real.shape[0]
        noise = jax.random.normal(dkeys[13], (b,) + tuple(model.latent_shape))
        ev = {"params": state.enc_params, "batch_stats": state.enc_stats}
        dv = {"params": state.dec_params, "batch_stats": state.dec_stats}
        total = 0.0
        # phase-E shaped forwards
        fake, dv = model.decode(dv, noise, train=True, dropout_rng=dkeys[0])
        (mu, logvar), ev = model.encode(ev, real, train=True, dropout_rng=dkeys[1])
        z = reparameterize(dkeys[2], mu, logvar)
        rec, dv = model.decode(dv, z, train=True, dropout_rng=dkeys[3])
        total += calc_reconstruction_loss(real, rec, reduction="mean")
        total += calc_kl(logvar, mu, reduce="mean")
        (rmu, rlv), ev = model.encode(ev, sg(rec), train=True, dropout_rng=dkeys[4])
        zr = reparameterize(dkeys[5], rmu, rlv)
        rr, dv = model.decode(dv, zr, train=True, dropout_rng=dkeys[6])
        (fmu, flv), ev = model.encode(ev, sg(fake), train=True, dropout_rng=dkeys[7])
        zf = reparameterize(dkeys[8], fmu, flv)
        rf, dv = model.decode(dv, zf, train=True, dropout_rng=dkeys[9])
        total += calc_reconstruction_loss(fake, rf, reduction="mean")
        total += calc_reconstruction_loss(rec, rr, reduction="mean")
        # phase-D extra forwards (2 encodes + 2 decodes; dec(noise)/dec(z)
        # are CSE-able duplicates in the real step)
        (rmu2, rlv2), ev = model.encode(ev, rec, train=True, dropout_rng=dkeys[10])
        (fmu2, flv2), ev = model.encode(ev, fake, train=True, dropout_rng=dkeys[11])
        rr2, dv = model.decode(dv, sg(reparameterize(dkeys[12], rmu2, rlv2)),
                               train=True, dropout_rng=dkeys[4])
        rf2, dv = model.decode(dv, sg(reparameterize(dkeys[0], fmu2, flv2)),
                               train=True, dropout_rng=dkeys[5])
        total += calc_reconstruction_loss(rec, rr2, reduction="mean")
        total += calc_reconstruction_loss(fake, rf2, reduction="mean")
        return total

    f = jax.jit(fwd_only)
    report("forwards_only_12", timed(
        lambda: f(state, x), lambda v: float(jax.device_get(v)), args.steps))

    # 3. eval-mode step (no dropout masks, running BN stats, no grads)
    ev_step = jax.jit(make_soft_intro_eval_step(model, loss_cfg, base.input_shape))
    key = jax.random.key(1)
    report("eval_step_12fwd", timed(
        lambda: ev_step(state, x, key),
        lambda m: float(jax.device_get(m["lossE"])), args.steps))

    # 1. full train step (conv_outs policy) — the reference point
    step = jax.jit(make_soft_intro_train_step(
        model, loss_cfg, OptimConfig(), 100, base.input_shape),
        donate_argnums=(0,))
    holder = {"s": state}

    def run_step():
        holder["s"], m = step(holder["s"], x)
        return m

    report("full_step", timed(
        run_step, lambda m: float(jax.device_get(m["lossE"])), args.steps))

    # 4. full train step with dropout disabled (quantifies dropout mask cost)
    nodrop = dataclasses.replace(base, act=base.act.with_no_dropout())
    model_nd, state_nd = setup(nodrop)
    step_nd = jax.jit(make_soft_intro_train_step(
        model_nd, loss_cfg, OptimConfig(), 100, nodrop.input_shape),
        donate_argnums=(0,))
    holder_nd = {"s": state_nd}

    def run_nd():
        holder_nd["s"], m = step_nd(holder_nd["s"], x)
        return m

    report("full_step_no_dropout", timed(
        run_nd, lambda m: float(jax.device_get(m["lossE"])), args.steps))


if __name__ == "__main__":
    main()
