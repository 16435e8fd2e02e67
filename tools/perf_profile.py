"""Capture an xplane profile of the flagship two-phase step and aggregate
device busy time by op bucket (the PERF.md breakdown table).

Usage:
  python tools/perf_profile.py [--variant block_conv_outs_no_dec_hi]
                               [--batch 8] [--steps 2] [--out /tmp/xplane]

Prints one JSON line: {"variant":..., "step_ms":..., "buckets": {...}}.
Bucket = XLA op name with trailing ".<n>"/digits stripped (fusion, copy,
convolution, convert_reduce_fusion, reduce-window, select-and-scatter, ...).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(variant: str, batch: int, steps: int, out_dir: str) -> str:
    import jax

    from tools.perf_sweep import VARIANTS  # reuse the variant builder
    import dataclasses

    import jax.numpy as jnp

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.data.preprocess import preprocess_batch
    from sivae_tpu.data.synthetic import synthetic_brain_batch
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step
    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    remat, policy, remat_calls, calls_policy = VARIANTS[variant]
    cfg = dataclasses.replace(get_model_config("spatial_1200"),
                              dtype=jnp.bfloat16, remat=remat,
                              remat_policy=policy)
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
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(state, x).compile()
    for _ in range(2):  # warmup
        state, metrics = compiled(state, x)
    float(jax.device_get(metrics["lossE"]))

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, x)
    float(jax.device_get(metrics["lossE"]))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return dt / steps


def aggregate(out_dir: str, steps: int):
    """Aggregate per-op busy time from the newest .xplane.pb under out_dir."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:  # proto location varies across tf versions
        from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane.pb under {out_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    buckets = collections.Counter()
    total_ps = 0
    for plane in xspace.planes:
        if "/device:TPU" not in plane.name and "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            ev_names = {i: m.name for i, m in plane.event_metadata.items()}
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                # names are full HLO strings like
                # "%fusion.3407 = bf16[...] fusion(...), kind=kOutput, ..."
                m = re.match(r"%?([a-zA-Z_][\w-]*)", name)
                b = m.group(1) if m else name[:24]
                if b == "fusion":
                    km = re.search(r"kind=k(\w+)", name)
                    if km:
                        b = f"fusion.{km.group(1)}"
                buckets[b] += ev.duration_ps
                total_ps += ev.duration_ps
    ms = {k: round(v / 1e9 / steps, 1) for k, v in buckets.most_common(12)}
    return ms, round(total_ps / 1e9 / steps, 1)


def top_ops(out_dir: str, steps: int, n: int = 25):
    """Aggregate by individual op (name prefix before ' = '), descending."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    per_op = collections.Counter()
    shapes = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            ev_names = {i: m.name for i, m in plane.event_metadata.items()}
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                op = name.split(" = ")[0]
                per_op[op] += ev.duration_ps
                if op not in shapes:
                    m = re.search(r"= (\S+)", name)
                    shapes[op] = m.group(1) if m else "?"
    return [(op, round(ps / 1e9 / steps, 2), shapes.get(op, "?")[:48])
            for op, ps in per_op.most_common(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="block_conv_outs_no_dec_hi")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/xplane_prof")
    ap.add_argument("--aggregate-only", action="store_true")
    args = ap.parse_args()

    step_s = None
    if not args.aggregate_only:
        step_s = capture(args.variant, args.batch, args.steps, args.out)
    buckets, busy_ms = aggregate(args.out, args.steps)
    print(json.dumps({
        "variant": args.variant,
        "step_ms_wall": round(1000 * step_s, 1) if step_s else None,
        "busy_ms_per_step": busy_ms,
        "buckets_ms": buckets,
    }))


if __name__ == "__main__":
    main()
