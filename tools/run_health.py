"""Apply the committed long-run health criterion to a run's sweep.json.

Usage: python tools/run_health.py runs_e2e/z1200_synth_r3 [--drift 0.05]
Writes <run_dir>/health.json and prints it; exits 1 if unhealthy — usable
as a post-training gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sivae_tpu.eval.sweep import run_health  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--drift-frac", type=float, default=0.3,
                    help="max fraction of the total val-RMSE improvement a "
                         "post-best checkpoint may give back")
    ap.add_argument("--min-ssim3d", type=float, default=0.2)
    args = ap.parse_args()

    with open(os.path.join(args.run_dir, "sweep.json")) as f:
        sweep = json.load(f)
    health = run_health(sweep, drift_frac=args.drift_frac,
                        min_ssim3d=args.min_ssim3d)
    with open(os.path.join(args.run_dir, "health.json"), "w") as f:
        json.dump(health, f, indent=2)
    print(json.dumps(health, indent=2))
    sys.exit(0 if health["healthy"] else 1)


if __name__ == "__main__":
    main()
