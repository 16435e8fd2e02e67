"""Checkpoint-sweep a training run directory (VERDICT r2 next-#3 evidence).

Rebuilds the run's exact val split from its args.json (synthetic source +
grouped_split seeds), then runs eval/sweep.py over every orbax checkpoint,
writing sweep.json + recon panels into the run dir.

Usage: python tools/sweep_run.py runs_e2e/z1200_synth_r3 [--panels]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--panels", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    with open(os.path.join(args.run_dir, "args.json")) as f:
        run_args = json.load(f)
    assert run_args["synthetic"], "only synthetic runs supported here"

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from sivae_tpu.data.pipeline import BrainDataSource, grouped_split
    from sivae_tpu.data.preprocess import preprocess_voxel_np
    from sivae_tpu.data.synthetic import SyntheticBrainSource
    from sivae_tpu.eval.sweep import sweep_checkpoints
    from sivae_tpu.models.registry import get_model_config, make_model

    records = list(SyntheticBrainSource(
        run_args["synthetic"], tuple(get_model_config("spatial_1200").input_shape),
        seed=82))
    src = BrainDataSource(records)
    _, vid = grouped_split(src.labels, src.pids, n_splits=5, split_index=4,
                           seed=run_args["seed_split"])
    val = src.subset(vid)
    vox = np.stack([preprocess_voxel_np(v) for v in val.voxels])[..., None]

    cfg = get_model_config("spatial_1200")
    if run_args.get("bf16"):
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = make_model(cfg)

    panel_dir = os.path.join(args.run_dir, "sweep_panels") if args.panels else None
    if panel_dir:
        os.makedirs(panel_dir, exist_ok=True)
    results = sweep_checkpoints(
        model, cfg, vox, ckpt_dir=os.path.abspath(
            os.path.join(args.run_dir, "ckpt")),
        batch_size=args.batch, panel_dir=panel_dir)
    out = os.path.join(args.run_dir, "sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    for r in results:
        print(f"ckpt {r['checkpoint']:>4}: rmse {r['rmse']:.4f} "
              f"psnr {r['psnr']:.2f} ssim3d {r['ssim3d']:.4f}")
    print("wrote", out)


if __name__ == "__main__":
    main()
