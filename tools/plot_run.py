"""Plot a training run's convergence evidence (VERDICT r2 next-#3).

Reads metrics.jsonl (per-epoch train/val losses + RMSE) and sweep.json
(per-checkpoint RMSE/PSNR/SSIM from tools/sweep_run.py) from a run dir and
writes trajectory.png with the three panels the judge asked for: loss
curves, val-RMSE trajectory with LR milestones, and the checkpoint
SSIM/RMSE sweep.

Usage: python tools/plot_run.py runs_e2e/z1200_synth_r3
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    args = ap.parse_args()

    with open(os.path.join(args.run_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    sweep_path = os.path.join(args.run_dir, "sweep.json")
    sweep = json.load(open(sweep_path)) if os.path.exists(sweep_path) else []
    run_args_path = os.path.join(args.run_dir, "args.json")
    milestones = []
    if os.path.exists(run_args_path):
        milestones = json.load(open(run_args_path)).get("milestones") or []

    ep = [r["epoch"] for r in rows]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))

    ax = axes[0]
    ax.plot(ep, [r["train_lossE"] for r in rows], label="train lossE")
    ax.plot(ep, [r["train_lossD"] for r in rows], label="train lossD")
    ax.set_xlabel("epoch")
    ax.set_title("soft-intro losses")
    ax.legend()

    ax = axes[1]
    ax.plot(ep, [r["val_rmse"] for r in rows], label="val RMSE")
    ax.plot(ep, [r["train_rmse"] for r in rows], label="train RMSE", alpha=0.6)
    for m in milestones:
        ax.axvline(m, color="gray", ls="--", lw=1, label=f"LR x0.1 @ {m}")
    ax.set_xlabel("epoch")
    ax.set_title("reconstruction RMSE")
    ax.legend()

    if sweep:
        se = [int(r["checkpoint"]) for r in sweep]
        ax = axes[2]
        ax.plot(se, [r["ssim3d"] for r in sweep], marker="o", ms=3,
                label="ssim3d")
        ax2 = ax.twinx()
        ax2.plot(se, [r["rmse"] for r in sweep], marker="s", ms=3,
                 color="tab:orange", label="rmse")
        ax.set_xlabel("checkpoint epoch")
        ax.set_title("checkpoint sweep (val split)")
        ax.legend(loc="upper left")
        ax2.legend(loc="upper right")
    else:
        axes[2].set_visible(False)

    out = os.path.join(args.run_dir, "trajectory.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
