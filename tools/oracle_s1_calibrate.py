"""Offline calibration for test_one_step_state_parity.

Replicates the test's three assertion groups using the replay dump from
`tools/oracle_replay.py --steps 1 --no-fuse-upconv --out
/tmp/oracle_ours_s1.npz` against tests/golden/reference_oracle_s1.npz,
printing per-leaf err/tol ratios so tolerances can be set from data
without paying the 25-50 min fixture run per iteration.

Usage: JAX_PLATFORMS=cpu python tools/oracle_s1_calibrate.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sivae_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.tree_util import keystr, tree_leaves_with_path  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="/tmp/oracle_ours_s1.npz")
    args = ap.parse_args()

    from sivae_tpu.config import SpatialVAEConfig
    from sivae_tpu.models.registry import make_model
    from sivae_tpu.utils.torch_import import import_spatial_soft_intro_vae

    golden_dir = os.path.join(REPO, "tests", "golden")
    s1 = np.load(os.path.join(golden_dir, "reference_oracle_s1.npz"))
    with open(os.path.join(golden_dir, "reference_oracle_s1.json")) as f:
        meta = json.load(f)
    ours = np.load(args.ours)

    cfg = SpatialVAEConfig(
        in_ch=meta["in_ch"],
        block_setting=tuple(tuple(b) for b in meta["block_setting"]),
        input_shape=tuple(meta["input_shape"]))
    cfg = dataclasses.replace(cfg, act=cfg.act.with_no_dropout(),
                              fuse_upconv=False)
    model = make_model(cfg)
    x0 = jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32)
    variables = model.init(jax.random.key(0), x0)

    sub = lambda p: {k[len(p):]: s1[k] for k in s1.files if k.startswith(p)}
    final = import_spatial_soft_intro_vae(sub("final/"), cfg, variables)
    init = import_spatial_soft_intro_vae(sub("init/"), cfg, variables)

    def moments(prefix, module_prefix, kind):
        fake = dict(sub("final/"))
        for k in s1.files:
            if k.startswith(prefix) and k.endswith("." + kind):
                pname = k[len(prefix):-len("." + kind)]
                fake[f"{module_prefix}.{pname}"] = s1[k]
        return import_spatial_soft_intro_vae(fake, cfg, variables)

    def report(group, ftree, itree, frac, floor, adam_noise_floor=0.0,
               movement_is_magnitude=False):
        print(f"\n=== {group} (frac={frac}, floor={floor}, "
              f"anf={adam_noise_floor}) ===")
        worst = 0.0
        for path, f in tree_leaves_with_path(ftree):
            key = f"{group.split()[0]}/{keystr(path)}"
            if key not in ours.files:
                print(f"  MISSING ours key: {key}")
                continue
            o = ours[key].astype(np.float64)
            f = np.asarray(f, np.float64)
            if movement_is_magnitude:
                moved = np.linalg.norm(f)
            else:
                i = np.asarray(
                    [x for p, x in tree_leaves_with_path(itree)
                     if keystr(p) == keystr(path)][0], np.float64)
                moved = np.linalg.norm(f - i)
            err = np.linalg.norm(o - f)
            tol = frac * moved + floor + adam_noise_floor * np.sqrt(o.size)
            r = err / tol
            worst = max(worst, r)
            no, nf = np.linalg.norm(o), np.linalg.norm(f)
            cos = (float(np.dot(o.ravel(), f.ravel()) / (no * nf))
                   if no > 0 and nf > 0 else np.nan)
            flag = " <-- FAIL" if r > 1 else ""
            print(f"  {keystr(path):70s} err={err:9.3e} tol={tol:9.3e} "
                  f"ratio={r:6.3f} |o|={no:9.3e} |f|={nf:9.3e} "
                  f"cos={cos:+.4f}{flag}")
        print(f"  worst ratio: {worst:.3f}")
        return worst

    w = []
    w.append(report("enc_stats", final["enc"]["batch_stats"],
                    init["enc"]["batch_stats"], frac=0.02, floor=1e-4))
    w.append(report("dec_stats", final["dec"]["batch_stats"],
                    init["dec"]["batch_stats"], frac=0.02, floor=1e-4))

    mu_e = moments("adam_e/", "encoder", "exp_avg")["enc"]["params"]
    mu_d = moments("adam_d/", "decoder", "exp_avg")["dec"]["params"]
    w.append(report("adam_e_mu", mu_e, None, frac=0.05, floor=1e-9,
                    adam_noise_floor=2e-5, movement_is_magnitude=True))
    w.append(report("adam_d_mu", mu_d, None, frac=0.05, floor=1e-9,
                    adam_noise_floor=2e-5, movement_is_magnitude=True))

    # --- param per-element update-sign mismatch fraction ---
    lr = 2e-4
    for what, fkey, ikey in (("enc", final["enc"]["params"],
                              init["enc"]["params"]),
                             ("dec", final["dec"]["params"],
                              init["dec"]["params"])):
        mism = tot = 0
        for path, f in tree_leaves_with_path(fkey):
            key = f"{what}_params/{keystr(path)}"
            o = ours[key].astype(np.float64)
            f = np.asarray(f, np.float64)
            leaf_m = int(np.sum(np.abs(o - f) > 0.5 * lr))
            mism += leaf_m
            tot += o.size
            if leaf_m:
                print(f"  {what} {keystr(path):60s} mism {leaf_m}/{o.size}")
        print(f"{what} params mismatch fraction: {mism}/{tot} "
              f"= {mism / tot:.4%} (test bound 5%)")

    print(f"\nWORST norm-track ratio across groups: {max(w):.3f}")


if __name__ == "__main__":
    main()
