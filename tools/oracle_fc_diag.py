"""One-step FC-oracle diagnostic: replay the fc_s1 golden through our step
and print EVERY enc/dec Adam-mu (gradient) leaf's error vs the reference,
plus BN-stat and param-update summaries — so tolerances for
tests/test_reference_oracle_fc.py are set from data instead of paying the
~8 min test run per iteration.

Usage: JAX_PLATFORMS=cpu python tools/oracle_fc_diag.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from sivae_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu()

import jax  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.tree_util import keystr, tree_leaves_with_path  # noqa: E402


def main():
    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step
    from sivae_tpu.utils.torch_import import import_fc_soft_intro_vae
    from test_reference_oracle_fc import _build_fc_model

    golden_dir = os.path.join(REPO, "tests", "golden")
    s1 = np.load(os.path.join(golden_dir, "reference_oracle_fc_s1.npz"))
    with open(os.path.join(golden_dir, "reference_oracle_fc_s1.json")) as f:
        meta = json.load(f)
    cfg, model, variables = _build_fc_model(meta)

    sub = lambda p: {k[len(p):]: s1[k] for k in s1.files if k.startswith(p)}
    imported = import_fc_soft_intro_vae(sub("init/"), cfg, variables)
    state = create_train_state(
        model, jax.random.key(1),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=1)
    state = state.replace(
        enc_params=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["params"]),
        dec_params=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["params"]),
        enc_stats=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["batch_stats"]),
        dec_stats=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["batch_stats"]))

    rng = np.random.RandomState(meta["data_seed"])
    x_train = rng.rand(meta["batch"], 1, *cfg.input_shape).astype(np.float32)
    assert (hashlib.sha256(x_train.tobytes()).hexdigest()
            == meta["x_train_sha256"])
    fixed = jnp.asarray(np.random.RandomState(meta["noise"]["seed"])
                        .randn(meta["batch"], cfg.z_ch).astype(np.float32))
    loss_cfg = SoftIntroLossConfig(
        beta_rec=meta["beta_rec"], beta_neg=meta["beta_neg"],
        beta_kl=meta["beta_kl"])
    step_fn = jax.jit(make_soft_intro_train_step(
        model, loss_cfg, OptimConfig(), 1, cfg.input_shape,
        zero_noise=True, fixed_noise=fixed))
    ours, metrics = step_fn(state, jnp.asarray(np.moveaxis(x_train, 1, -1)))
    print("lossE ours %.6f golden %.6f" % (float(metrics["lossE"]),
                                           meta["lossE"][0]))
    print("lossD ours %.6f golden %.6f" % (float(metrics["lossD"]),
                                           meta["lossD"][0]))

    def moments(prefix, module_prefix, kind):
        fake = dict(sub("final/"))
        for k in s1.files:
            if k.startswith(prefix) and k.endswith("." + kind):
                pname = k[len(prefix):-len("." + kind)]
                fake[f"{module_prefix}.{pname}"] = s1[k]
        return import_fc_soft_intro_vae(fake, cfg, variables)

    for side, otree, ref in (
            ("enc", ours.opt_e[0].mu,
             moments("adam_e/", "encoder", "exp_avg")["enc"]["params"]),
            ("dec", ours.opt_d[0].mu,
             moments("adam_d/", "decoder", "exp_avg")["dec"]["params"])):
        print(f"--- {side} Adam mu (gradient) leaves ---")
        for n, ((path, o), (_, r)) in enumerate(zip(
                tree_leaves_with_path(otree), tree_leaves_with_path(ref))):
            o = np.asarray(o, np.float64)
            r = np.asarray(r, np.float64)
            err = np.linalg.norm(o - r)
            mag = np.linalg.norm(r)
            cos = (float(np.dot(o.ravel(), r.ravel()) /
                         (np.linalg.norm(o) * mag))
                   if mag > 0 and np.linalg.norm(o) > 0 else float("nan"))
            print(f"{n:3d} {keystr(path):55s} numel={o.size:8d} "
                  f"err={err:.3e} |ref|={mag:.3e} "
                  f"rel={err / max(mag, 1e-300):8.2e} cos={cos:+.4f}")

    for side, otree, ftree, itree in (
            ("enc stats", ours.enc_stats, imported and
             import_fc_soft_intro_vae(sub("final/"), cfg, variables)["enc"]["batch_stats"],
             imported["enc"]["batch_stats"]),
            ("dec stats", ours.dec_stats,
             import_fc_soft_intro_vae(sub("final/"), cfg, variables)["dec"]["batch_stats"],
             imported["dec"]["batch_stats"])):
        print(f"--- {side} ---")
        for n, ((path, o), (_, f2), (_, i2)) in enumerate(zip(
                tree_leaves_with_path(otree), tree_leaves_with_path(ftree),
                tree_leaves_with_path(itree))):
            o, f2, i2 = (np.asarray(o, np.float64), np.asarray(f2, np.float64),
                         np.asarray(i2, np.float64))
            err = np.linalg.norm(o - f2)
            moved = np.linalg.norm(f2 - i2)
            print(f"{n:3d} {keystr(path):55s} err={err:.3e} "
                  f"moved={moved:.3e} ratio={err / max(moved, 1e-300):8.2e}")


if __name__ == "__main__":
    main()
