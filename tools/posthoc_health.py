"""Apply the long-run health gate to an interrupted training run.

`cli/train.py --health-gate` sweeps + gates only when `fit()` returns; a run
stopped early (host reclaimed, wall-clock budget) leaves checkpoints but no
sweep.json/health.json. This tool rebuilds the model + val split from the
run's committed `args.json` snapshot and applies the same frozen criterion
(`cli.train.apply_health_gate`) over whatever checkpoints exist.

Usage: python tools/posthoc_health.py runs_e2e/z1200_synth_r5
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    args = ap.parse_args()

    with open(os.path.join(args.run_dir, "args.json")) as f:
        saved = json.load(f)
    saved.pop("model_config", None)
    ns = argparse.Namespace(**saved)
    ns.run_dir = args.run_dir

    import jax.numpy as jnp

    from cli.train import PRESETS, apply_health_gate, build_pipelines
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    preset = PRESETS[ns.preset]
    cfg = get_model_config(ns.model or preset["model"])
    if ns.bf16:
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    # augment applies to the train split only; the gate reads val
    _, val, _ = build_pipelines(ns, cfg.input_shape, augment_spec=None)
    model = make_model(cfg)
    apply_health_gate(model, cfg, val.source, args.run_dir, ns.batch)


if __name__ == "__main__":
    main()
