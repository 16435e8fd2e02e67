"""Benchmark: Soft-IntroVAE 1200-d training throughput (volumes/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

- value: volumes/sec through the full two-phase adversarial train step on
  the flagship spatial 1200-d config (reference z-1200main.py:158, batch=8,
  80x96x80 volumes), bf16 conv compute / fp32 params+losses, on the
  available accelerator.
- vs_baseline: ratio vs the PyTorch-CPU reference implementation running
  the same two-phase step (BASELINE.json target: >=5x). The torch number
  is measured once against /root/reference's model code and cached in
  baseline_cpu.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "baseline_cpu.json")


V5E_BF16_PEAK_FLOPS = 197e12  # per-chip bf16 peak (MXU), for MFU accounting


def measure_tpu(batch: int, steps: int, warmup: int):
    """Returns (volumes/sec, details dict with per-step percentiles + MFU)."""
    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.data.preprocess import preprocess_batch
    from sivae_tpu.data.synthetic import synthetic_brain_batch
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step

    cfg = dataclasses.replace(get_model_config("spatial_1200"), dtype=jnp.bfloat16)
    model = make_model(cfg)
    vox, _ = synthetic_brain_batch(batch, cfg.input_shape, seed=0)
    x = preprocess_batch(jax.device_put(vox))

    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=100)
    step_fn = make_soft_intro_train_step(
        model, SoftIntroLossConfig(), OptimConfig(), 100, cfg.input_shape)
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(state, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    flops_per_step = float(ca.get("flops", 0.0))

    for _ in range(warmup):
        state, metrics = compiled(state, x)
    # force a host round-trip: under the remote-relay backend
    # block_until_ready does not reliably block, so fetch a scalar value
    float(jax.device_get(metrics["lossE"]))
    # headline loop: async dispatch, one sync at the end (the production
    # loop shape — per-step syncing costs ~2% in host round-trips)
    t_all0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, x)
    nan = bool(jax.device_get(metrics["nan"]))
    dt = time.perf_counter() - t_all0
    assert not nan, "NaN in benchmark training"
    # separate short synced loop for per-step percentiles
    times = []
    for _ in range(max(4, steps // 2)):
        t0 = time.perf_counter()
        state, metrics = compiled(state, x)
        float(jax.device_get(metrics["lossE"]))
        times.append(time.perf_counter() - t0)
    import numpy as np

    step_s = dt / steps
    details = {
        "step_ms_mean": round(1000 * step_s, 1),
        "step_ms_p50": round(1000 * float(np.percentile(times, 50)), 1),
        "step_ms_p90": round(1000 * float(np.percentile(times, 90)), 1),
        "flops_per_step_T": round(flops_per_step / 1e12, 1),
        # compiled.cost_analysis() flops include remat-recomputed work, so
        # this is hardware-FLOPs utilization, not model-FLOPs MFU
        "hw_flops_utilization": round(flops_per_step / step_s / V5E_BF16_PEAK_FLOPS, 3),
    }
    return batch * steps / dt, details


def measure_encode(batch: int = 16, steps: int = 10, warmup: int = 2):
    """Batch encode throughput (volumes/sec) + MFU — the CBIR path.

    Reference anchor: ~27 volumes/s at batch=1 on a GPU
    (logistic1.ipynb cell 7, SURVEY §6). Returns (vps, details)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sivae_tpu.data.preprocess import preprocess_batch
    from sivae_tpu.data.synthetic import synthetic_brain_batch
    from sivae_tpu.models.registry import get_model_config, make_model

    cfg = dataclasses.replace(get_model_config("spatial_1200"), dtype=jnp.bfloat16)
    model = make_model(cfg)
    vox, _ = synthetic_brain_batch(batch, cfg.input_shape, seed=0)
    x = preprocess_batch(jax.device_put(vox))
    variables = model.init(jax.random.key(0), x[:1])
    enc_vars = variables["enc"]

    def enc(x):
        (mu, _), _ = model.encode(enc_vars, x)
        return mu

    compiled = _compile_with_retry(jax.jit(enc).lower(x))
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    mu = compiled(x)  # always run once so the sync below has a value
    for _ in range(max(0, warmup - 1)):
        mu = compiled(x)
    float(jax.device_get(mu[0, 0, 0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        mu = compiled(x)
    float(jax.device_get(mu[0, 0, 0, 0, 0]))
    dt = time.perf_counter() - t0
    vps = batch * steps / dt
    return vps, {
        "batch": batch,
        "step_ms": round(1000 * dt / steps, 1),
        "flops_T": round(flops / 1e12, 2),
        # encode runs no remat, so this IS model-FLOPs MFU
        "mfu": round(flops / (dt / steps) / V5E_BF16_PEAK_FLOPS, 3),
    }


def _compile_with_retry(lowered, attempts: int = 3):
    """compile() with retries for the remote-compile relay's transient
    HTTP 500 (TPU_WORKER_HOSTNAMES) flake. A genuine compile failure
    (e.g. HBM OOM, reported through the same HTTP 500 channel with a
    'Ran out of memory' relay log) still fails after `attempts`."""
    last = None
    for i in range(attempts):
        try:
            return lowered.compile()
        except Exception as e:  # jax.errors.JaxRuntimeError
            last = e
            if "500" not in str(e) and "INTERNAL" not in str(e):
                raise
            time.sleep(5 * (i + 1))
    raise last


def sweep_encode(batches=(8, 16, 32, 48), steps: int = 10):
    """Find the best encode batch (VERDICT r2 next-#8: the north-star
    metric is train+encode vol/s/chip, BASELINE.json:5). Batch 64 is
    excluded by default: its no-remat encode program needs 18.76 GB
    HBM > 15.75 GB (measured 2026-08-17; the relay reports the OOM as a
    generic HTTP 500, indistinguishable from its transient flake, so
    probing it costs 3 retried multi-minute compiles). Batch 48 fits
    (~14 GB) and is the measured best: 374.9 vol/s at MFU 0.414
    (2026-08-20) vs 365.2 at batch 32. A batch that fails anyway is
    recorded in the table instead of killing the sweep."""
    table = []
    best = None
    for b in batches:
        try:
            vps, details = measure_encode(batch=b, steps=steps)
        except Exception as e:
            table.append({"batch": b, "error": str(e).splitlines()[0][:160]})
            continue
        row = {"vps": round(vps, 1), **details}
        table.append(row)
        if best is None or vps > best[0]:
            best = (vps, row)
    if best is None:
        raise RuntimeError(f"every encode batch failed: {table}")
    return best[0], best[1], table


def measure_fullsize_train(batch: int = 1, steps: int = 4, warmup: int = 2):
    """Single-chip fullsize (160x192x160, ~5M voxel) train-step throughput.

    The reference README's headline claim is the ~4000x fullsize
    compression (reference README.md:20-21); the rebuild's fullsize story
    needs a perf number newer than the round-2 single data point
    (VERDICT r4 weak-#4). Batch 1 is the single-chip capacity point —
    larger batches train sharded over a data x spatial mesh
    (parallel/mesh.py volume_sharding, certified in MULTICHIP_r04).
    Returns (volumes/sec, details dict)."""
    import jax
    import jax.numpy as jnp

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.data.preprocess import preprocess_batch
    from sivae_tpu.data.synthetic import synthetic_brain_batch
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step
    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = dataclasses.replace(get_model_config("spatial_1200_fullsize"),
                              dtype=jnp.bfloat16)
    model = make_model(cfg)
    vox, _ = synthetic_brain_batch(batch, cfg.input_shape, seed=0)
    x = preprocess_batch(jax.device_put(vox))
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=100)
    step_fn = make_soft_intro_train_step(
        model, SoftIntroLossConfig(), OptimConfig(), 100, cfg.input_shape)
    compiled = _compile_with_retry(
        jax.jit(step_fn, donate_argnums=(0,)).lower(state, x))
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    flops_per_step = float(ca.get("flops", 0.0))
    for _ in range(warmup):
        state, metrics = compiled(state, x)
    float(jax.device_get(metrics["lossE"]))  # sync (see measure_tpu)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, x)
    nan = bool(jax.device_get(metrics["nan"]))
    dt = time.perf_counter() - t0
    assert not nan, "NaN in fullsize benchmark training"
    step_s = dt / steps
    return batch * steps / dt, {
        "batch": batch,
        "input_shape": list(cfg.input_shape),
        "step_ms": round(1000 * step_s, 1),
        "flops_per_step_T": round(flops_per_step / 1e12, 1),
        "hw_flops_utilization": round(
            flops_per_step / step_s / V5E_BF16_PEAK_FLOPS, 3),
    }


def measure_torch_cpu_baseline(batch: int = 8, steps: int = 3) -> float:
    """Time the reference PyTorch model's two-phase step on CPU.

    Imports the reference's models/models.py (torch-only deps) and drives it
    with the reference trainer's loss math (utils/my_trainer.py:234-324) as
    a measurement harness.
    """
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, "/root/reference")
    import models.models as ref_models  # noqa: E402

    torch.manual_seed(0)
    device = torch.device("cpu")
    model = ref_models.SoftIntroVAE(64, [[64, 1, 2], [128, 1, 2], [256, 2, 2]]).to(device)
    opt_e = torch.optim.Adam(model.encoder.parameters(), lr=2e-4)
    opt_d = torch.optim.Adam(model.decoder.parameters(), lr=2e-4)
    scale = 8.0 / (80 * 96 * 80)
    beta_rec, beta_neg, beta_kl, gamma_r = 1.0, 1024.0, 0.75, 1e-8

    def recon(a, b, mean):
        m = F.mse_loss(a.view(a.size(0), -1), b.view(b.size(0), -1), reduction="none").sum(1)
        return m.mean() if mean else m

    def kl(logvar, mu, mean):
        mu = mu.view(mu.size(0), -1)
        logvar = logvar.view(logvar.size(0), -1)
        k = -0.5 * torch.sum(1 + logvar - mu**2 - logvar.exp(), dim=1)
        return k.mean() if mean else k

    x = torch.rand(batch, 1, 80, 96, 80)

    def one_step():
        noise = torch.randn(batch, 1, 10, 12, 10)
        for p in model.encoder.parameters():
            p.requires_grad = True
        for p in model.decoder.parameters():
            p.requires_grad = False
        fake = model.decode(noise)
        mu, logvar = model.encode(x)
        z = model.reparameterize(mu, logvar)
        rec = model.decode(z)
        loss_rec = recon(x, rec, True)
        kl_real = kl(logvar, mu, True)
        rm, rl, zr, rr = model.forward(rec.detach())
        fm, fl, zf, rf = model.forward(fake.detach())
        e_f = (-2 * scale * (beta_rec * recon(fake, rf, False) + beta_neg * kl(fl, fm, False))).exp().mean()
        e_r = (-2 * scale * (beta_rec * recon(rec, rr, False) + beta_neg * kl(rl, rm, False))).exp().mean()
        lossE = 10 * (scale * (beta_rec * loss_rec + beta_kl * kl_real) + 0.5 * (e_f + e_r))
        opt_e.zero_grad(); lossE.backward(); opt_e.step()
        for p in model.encoder.parameters():
            p.requires_grad = False
        for p in model.decoder.parameters():
            p.requires_grad = True
        fake = model.decode(noise)
        rec = model.decode(z.detach())
        loss_rec = recon(x, rec, True)
        rm, rl = model.encode(rec)
        zr = model.reparameterize(rm, rl)
        fm, fl = model.encode(fake)
        zf = model.reparameterize(fm, fl)
        rr = model.decode(zr.detach())
        rf = model.decode(zf.detach())
        lossD = 10 * scale * (beta_rec * loss_rec
                              + 0.5 * beta_kl * (kl(rl, rm, True) + kl(fl, fm, True))
                              + gamma_r * 0.5 * beta_rec * (recon(rec.detach(), rr, True)
                                                            + recon(fake.detach(), rf, True)))
        opt_d.zero_grad(); lossD.backward(); opt_d.step()

    model.train()
    # no warmup: torch eager CPU has no compile step, and a single
    # two-phase step at this scale already takes tens of minutes (hours on
    # a single-core host) — cache incrementally so a killed run still
    # yields data, and resume from the cache so completed steps are never
    # re-measured (each step is ~29 min here)
    step_times = []
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("batch") == batch and cached.get("steps_target") == steps:
            step_times = [float(t) for t in cached.get("step_seconds", [])]
    for i in range(len(step_times), steps):
        t0 = time.perf_counter()
        one_step()
        step_times.append(time.perf_counter() - t0)
        vps_so_far = batch * (i + 1) / sum(step_times)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({
                "torch_cpu_volumes_per_sec": vps_so_far,
                "batch": batch, "steps": i + 1, "steps_target": steps,
                "step_seconds": [round(t, 1) for t in step_times],
                "config": ("spatial_1200 two-phase step (my_trainer.py:"
                           "234-324 loss math), torch eager CPU, float32"),
                "torch_threads": torch.get_num_threads(),
            }, f, indent=2)
        print(f"baseline step {i + 1}/{steps}: {step_times[-1]:.1f}s "
              f"({vps_so_far:.4f} vol/s)", flush=True)
    return batch * steps / sum(step_times)


BASELINE_BATCH, BASELINE_STEPS = 8, 3


def get_baseline() -> tuple:
    """(rate, steps_completed) of the torch-CPU reference, cached with
    config metadata (batch, per-step seconds, thread count). The cache is
    invalidated when the batch changes; >=1 completed batch-8 step is
    accepted: on this single-core host one two-phase step is ~29 min of
    single-threaded eager torch, so the 3-step target (steps_target) is
    worked toward incrementally (the measurement loop resumes from the
    cache). steps_completed is surfaced in the bench JSON so the headline
    ratio records how many baseline steps it rests on."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if (cached.get("batch") == BASELINE_BATCH
                and cached.get("steps", 0) >= 1):
            return cached["torch_cpu_volumes_per_sec"], cached["steps"]
    rate = measure_torch_cpu_baseline(BASELINE_BATCH, BASELINE_STEPS)
    return rate, BASELINE_STEPS


# Per-probe diagnoses from probe_backend, so a bench run that survived (or
# lost) an outage is diagnosable post-hoc: surfaced in the bench JSON tail
# and, on give-up, dumped to BENCH_PROBE_LOG.json next to this file.
PROBE_LOG = []


def probe_backend(probe_timeout_s: float = 240.0,
                  retry_window_s: float = None,
                  retry_interval_s: float = 60.0) -> None:
    """Fail fast (eventually) if the accelerator backend is unreachable.

    Under the remote-attach TPU backend, a relay outage makes
    jax.devices() either raise Unavailable or hang indefinitely during
    backend init; an in-process hang would stall the whole benchmark
    run. Probe device enumeration in a subprocess with a hard timeout
    (generous: a healthy cold init is seconds, first-ever init tens of
    seconds). Relay outages are usually transient but round-4's ran
    multiple hours, so a failed probe is retried every
    `retry_interval_s` for up to `retry_window_s` (default 2 h — the
    probe is cheap and a give-up costs the round's artifact; override
    either way via BENCH_RETRY_WINDOW_S) before exiting 2. Each failed
    probe's diagnosis is appended to PROBE_LOG."""
    import subprocess

    if retry_window_s is None:
        retry_window_s = float(os.environ.get("BENCH_RETRY_WINDOW_S", 7200.0))
    start = time.monotonic()
    deadline = start + retry_window_s
    attempt = 0
    while True:
        attempt += 1
        diagnosis = None
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "from sivae_tpu.utils.platform import honor_jax_platforms_env;"
                 "honor_jax_platforms_env();"
                 "import jax; print(jax.devices())"],
                capture_output=True, text=True, timeout=probe_timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            if r.returncode == 0:
                return
            diagnosis = "backend init failed:\n" + r.stderr[-2000:]
        except subprocess.TimeoutExpired:
            diagnosis = (f"backend init did not respond within "
                         f"{probe_timeout_s:.0f}s (TPU relay down?)")
        PROBE_LOG.append({"attempt": attempt,
                          "t_s": round(time.monotonic() - start, 1),
                          "diagnosis": diagnosis.splitlines()[0][:200]})
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"bench: {diagnosis}\nbench: gave up after {attempt} probes "
                  f"over {retry_window_s / 60:.0f} min", file=sys.stderr)
            try:
                with open(os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_PROBE_LOG.json"), "w") as f:
                    json.dump({"gave_up": True,
                               "retry_window_s": retry_window_s,
                               "probes": PROBE_LOG}, f, indent=2)
            except OSError:
                pass
            sys.exit(2)
        print(f"bench: probe {attempt} failed ({diagnosis.splitlines()[0]}); "
              f"retrying in {retry_interval_s:.0f}s "
              f"({remaining / 60:.0f} min left in retry window)",
              file=sys.stderr, flush=True)
        time.sleep(retry_interval_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--complete-baseline", action="store_true",
                    help="finish the torch-CPU baseline cache to its "
                         "steps_target before reporting (each missing step "
                         "is ~29 min of dedicated single-core CPU; without "
                         "this flag a partial cache with >=1 step is used "
                         "as-is and reported via baseline_steps)")
    ap.add_argument("--details", action="store_true",
                    help="also measure encode throughput; write BENCH_DETAILS.json")
    args = ap.parse_args()

    from sivae_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    probe_backend()
    value, details = measure_tpu(args.batch, args.steps, args.warmup)
    if args.skip_baseline:
        baseline, baseline_steps = None, 0
    else:
        if args.complete_baseline:
            measure_torch_cpu_baseline(BASELINE_BATCH, BASELINE_STEPS)
        baseline, baseline_steps = get_baseline()
    if args.details:
        encode_vps, encode_best, encode_table = sweep_encode()
        try:
            fullsize_vps, fullsize_details = measure_fullsize_train()
            fullsize_row = {"vps": round(fullsize_vps, 3), **fullsize_details}
        except Exception as e:  # capacity/relay failure: record, don't kill
            fullsize_row = {"error": str(e).splitlines()[0][:200]}
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAILS.json"), "w") as f:
            json.dump({
                "train_volumes_per_sec_per_chip": round(value, 3),
                "encode_volumes_per_sec_per_chip": round(encode_vps, 3),
                "encode_best": encode_best,
                "encode_batch_sweep": encode_table,
                "fullsize_train": fullsize_row,
                "torch_cpu_baseline_volumes_per_sec": baseline,
                "torch_cpu_baseline_steps": baseline_steps,
                "train_batch": args.batch,
                "config": "spatial_1200 (80x96x80 -> 1200-d), bf16 conv compute",
                **details,
            }, f, indent=2)
    print(json.dumps({
        "metric": "soft-intro-vae-1200d train throughput",
        "value": round(value, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(value / baseline, 3) if baseline else None,
        "baseline_steps": baseline_steps,
        **({"probe_failures": len(PROBE_LOG), "probe_log_tail": PROBE_LOG[-5:]}
           if PROBE_LOG else {}),
    }))


if __name__ == "__main__":
    main()
