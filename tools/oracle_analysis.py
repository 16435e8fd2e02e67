"""Per-leaf chaos analysis of the reference oracle (diagnosis companion to
tests/test_reference_oracle.py).

For every BN running stat (and optionally params), compares three final
states against the unperturbed golden run:

  - chaos(eps): reference-vs-itself under a relative init perturbation eps
    (tools/gen_reference_golden.py --perturb <eps> --perturb-tag <tag>);
  - ours: our step's final state from tools/oracle_replay.py.

Fits a local power law chaos(eps) = chaos(1e-6) * (eps/1e-6)^alpha from the
1e-7/1e-6 pair, then solves for the *effective* perturbation eps_eff whose
chaos radius equals our divergence. If eps_eff is consistent across leaves
and within the scale of benign cross-framework fp noise, the divergence
carries no parity signal; a leaf demanding an anomalously large eps_eff
points at a real semantic difference.

Round-3 measurement (this script, flagship-topology 2-ch oracle, 5 steps):
every one of the 32 BN-stat leaves lands at eps_eff in [4.7e-7, 6.4e-6]
(median ~1.2e-6), consistent with a single ~1e-6 weight-equivalent noise
scale — the same scale implied by the step-0 loss agreement (~3e-5 relative
on the exp-amplified lossE). No leaf is an order-of-magnitude outlier, so
the BN-stat threading matches the reference within its own chaos.

Usage:
  JAX_PLATFORMS=cpu python tools/oracle_replay.py   # writes /tmp/oracle_ours.npz
  python tools/oracle_analysis.py
"""

from __future__ import annotations

import argparse
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden")

# torch state_dict prefix -> our replay-dump key prefix (flax keystr)
DEC_BN = {
    "decoder.blocks.0.1": "dec_stats/['CheckpointConvBNAct_0']['BatchNorm_0']['BatchNorm_0']",
    "decoder.blocks.1.0.block.1": "dec_stats/['CheckpointUpBlock_0']['BatchNorm_0']['BatchNorm_0']",
    "decoder.blocks.1.0.block.5": "dec_stats/['CheckpointUpBlock_0']['BatchNorm_1']['BatchNorm_0']",
    "decoder.blocks.2.0.block.1": "dec_stats/['CheckpointUpBlock_1']['BatchNorm_0']['BatchNorm_0']",
    "decoder.blocks.2.0.block.5": "dec_stats/['CheckpointUpBlock_1']['BatchNorm_1']['BatchNorm_0']",
    "decoder.blocks.3.0.block.1": "dec_stats/['CheckpointUpBlock_2']['BatchNorm_0']['BatchNorm_0']",
    "decoder.blocks.3.0.block.5": "dec_stats/['CheckpointUpBlock_2']['BatchNorm_1']['BatchNorm_0']",
}
ENC_BN = {
    "encoder.blocks.0.1": "enc_stats/['CheckpointConvBNAct_0']['BatchNorm_0']['BatchNorm_0']",
    "encoder.blocks.1.0.block.1": "enc_stats/['CheckpointConvBlock_0']['BatchNorm_0']['BatchNorm_0']",
    "encoder.blocks.1.0.block.5": "enc_stats/['CheckpointConvBlock_0']['BatchNorm_1']['BatchNorm_0']",
    "encoder.blocks.2.0.block.1": "enc_stats/['CheckpointConvBlock_1']['BatchNorm_0']['BatchNorm_0']",
    "encoder.blocks.2.0.block.5": "enc_stats/['CheckpointConvBlock_1']['BatchNorm_1']['BatchNorm_0']",
    "encoder.blocks.3.0.block.1": "enc_stats/['CheckpointConvBlock_2']['BatchNorm_0']['BatchNorm_0']",
    "encoder.blocks.3.0.block.5": "enc_stats/['CheckpointConvBlock_2']['BatchNorm_1']['BatchNorm_0']",
    "encoder.blocks.4.0.block.1": "enc_stats/['CheckpointConvBlock_3']['BatchNorm_0']['BatchNorm_0']",
    "encoder.blocks.4.0.block.5": "enc_stats/['CheckpointConvBlock_3']['BatchNorm_1']['BatchNorm_0']",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="/tmp/oracle_ours.npz")
    args = ap.parse_args()

    g = np.load(os.path.join(GOLDEN, "reference_oracle.npz"))
    p7 = np.load(os.path.join(GOLDEN, "reference_oracle_perturbed.npz"))
    p6 = np.load(os.path.join(GOLDEN, "reference_oracle_perturbed_1e-6.npz"))
    ours = np.load(args.ours) if os.path.exists(args.ours) else None

    print(f"{'torch key':45s} {'err':>9s} {'chaos7':>9s} {'chaos6':>9s} "
          f"{'alpha':>6s} {'eps_eff':>9s}")
    eps_all = []
    for table in (ENC_BN, DEC_BN):
        for tk, ok in table.items():
            for stat, tstat in (("mean", "running_mean"), ("var", "running_var")):
                gk = f"final/{tk}.{tstat}"
                f = g[gk].astype(np.float64)
                c7 = np.linalg.norm(p7[gk].astype(np.float64) - f)
                c6 = np.linalg.norm(p6[gk].astype(np.float64) - f)
                row = f"{tk + '.' + tstat:45s}"
                if ours is not None:
                    e = np.linalg.norm(ours[f"{ok}['{stat}']"].astype(np.float64) - f)
                    alpha = np.log10(c6 / c7) if c7 > 0 else np.nan
                    eps = (1e-6 * (e / c6) ** (1 / alpha)
                           if c6 > 0 and alpha > 0 else np.nan)
                    eps_all.append(eps)
                    row += f" {e:9.3e} {c7:9.3e} {c6:9.3e} {alpha:6.2f} {eps:9.2e}"
                else:
                    row += f" {'-':>9s} {c7:9.3e} {c6:9.3e}"
                print(row)
    if eps_all:
        eps_all = np.array([e for e in eps_all if np.isfinite(e)])
        print(f"\neps_eff: median {np.median(eps_all):.2e}  "
              f"max {eps_all.max():.2e}  (n={len(eps_all)})")


if __name__ == "__main__":
    main()
