"""Remat-strategy perf sweep for the flagship two-phase step (VERDICT r1 #2).

Measures volumes/sec/chip and compiled memory for each remat variant at a
given batch size. Prints one JSON line per variant as it completes, so a
partial run still yields data.

Usage: python tools/perf_sweep.py [--batch 8] [--steps 10] [--variant NAME]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name: (model_remat, model_policy, remat_calls, calls_policy[, extra])
    # extra: additional dataclasses.replace overrides on the model config
    "block": (True, None, False, None),
    "block_conv_outs": (True, "conv_outs", False, None),
    "block_conv_outs_no_dec_hi": (True, "conv_outs_no_dec_hi", False, None),
    "block_conv_outs_no_enc_hi": (True, "conv_outs_no_enc_hi", False, None),
    "block_conv_outs_lo": (True, "conv_outs_lo", False, None),
    "calls": (False, None, True, None),
    "calls_conv_outs": (False, None, True, "conv_outs"),
    "none": (False, None, False, None),
    # A/B of the small-channel Pallas stencil convs (stem/tail); measured
    # a 12% REGRESSION at batch 8 (4.62 vs 5.23 vol/s) -> default off
    "block_conv_outs_no_dec_hi_small": (
        True, "conv_outs_no_dec_hi", False, None,
        {"use_pallas_small_ch": True}),
    # (round 5) the "block_conv_outs_no_dec_hi_fusedbn" variant was removed
    # with the megakernel's model routing: the micro A/B settled the
    # question without an end-to-end run (the fused stage is 29% slower
    # than XLA's on the exact target shape, so an end-to-end number could
    # only dilute the loss — docs/AB_MEGAKERNEL_r05.json, PERF.md round 5).
}


def run_variant(name: str, batch: int, steps: int, warmup: int):
    import jax
    import jax.numpy as jnp

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.data.preprocess import preprocess_batch
    from sivae_tpu.data.synthetic import synthetic_brain_batch
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step

    spec = VARIANTS[name]
    remat, policy, remat_calls, calls_policy = spec[:4]
    extra = spec[4] if len(spec) > 4 else {}
    cfg = dataclasses.replace(get_model_config("spatial_1200"),
                              dtype=jnp.bfloat16, remat=remat,
                              remat_policy=policy, **extra)
    model = make_model(cfg)
    vox, _ = synthetic_brain_batch(batch, cfg.input_shape, seed=0)
    x = preprocess_batch(jax.device_put(vox))
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=100)
    step_fn = make_soft_intro_train_step(
        model, SoftIntroLossConfig(), OptimConfig(), 100, cfg.input_shape,
        remat_calls=remat_calls, remat_calls_policy=calls_policy)

    lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(state, x)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    out = {
        "variant": name, "batch": batch,
        "temp_gb": round(getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2),
        "arg_gb": round(getattr(mem, "argument_size_in_bytes", 0) / 2**30, 2),
        "flops_T": round(float(ca.get("flops", 0.0)) / 1e12, 1),
    }

    for _ in range(warmup):
        state, metrics = compiled(state, x)
    float(jax.device_get(metrics["lossE"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, x)
    nan = bool(jax.device_get(metrics["nan"]))
    dt = time.perf_counter() - t0
    out["vol_per_sec"] = round(batch * steps / dt, 3)
    out["step_ms"] = round(1000 * dt / steps, 1)
    out["nan"] = nan
    out["mxu_tf_per_sec"] = round(out["flops_T"] / (dt / steps), 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--variant", action="append", default=None,
                    help="variant name(s); default: all")
    args = ap.parse_args()

    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    names = args.variant or list(VARIANTS)
    for name in names:
        try:
            res = run_variant(name, args.batch, args.steps, args.warmup)
        except Exception as e:  # OOM etc. — report and continue
            res = {"variant": name, "batch": args.batch,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
