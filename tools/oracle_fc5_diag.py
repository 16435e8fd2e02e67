"""Five-step FC-oracle diagnostic: replay the 5-step FC golden through our
step and print per-step train/val losses vs the reference plus every Adam
moment leaf's error against the test tolerance (incl. the measured-chaos
term) — data for setting tests/test_reference_oracle_fc.py tolerances
without paying the ~25-min test module per iteration.

Usage: JAX_PLATFORMS=cpu python tools/oracle_fc5_diag.py
"""

from __future__ import annotations

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
    from sivae_tpu.train.step import (
        make_soft_intro_eval_step,
        make_soft_intro_train_step,
    )
    from sivae_tpu.utils.torch_import import import_fc_soft_intro_vae
    from test_reference_oracle_fc import _build_fc_model

    golden_dir = os.path.join(REPO, "tests", "golden")
    g = np.load(os.path.join(golden_dir, "reference_oracle_fc.npz"))
    with open(os.path.join(golden_dir, "reference_oracle_fc.json")) as f:
        meta = json.load(f)
    pert_path = os.path.join(golden_dir, "reference_oracle_perturbed_fc.npz")
    pert = np.load(pert_path) if os.path.exists(pert_path) else None
    cfg, model, variables = _build_fc_model(meta)

    sub = lambda src, p: {k[len(p):]: src[k] for k in src.files
                          if k.startswith(p)}
    imported = import_fc_soft_intro_vae(sub(g, "init/"), cfg, variables)
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
    x_val = rng.rand(meta["batch"], 1, *cfg.input_shape).astype(np.float32)
    fixed = jnp.asarray(np.random.RandomState(meta["noise"]["seed"])
                        .randn(meta["batch"], cfg.z_ch).astype(np.float32))
    loss_cfg = SoftIntroLossConfig(
        beta_rec=meta["beta_rec"], beta_neg=meta["beta_neg"],
        beta_kl=meta["beta_kl"])
    step_fn = jax.jit(make_soft_intro_train_step(
        model, loss_cfg, OptimConfig(), 1, cfg.input_shape,
        zero_noise=True, fixed_noise=fixed))
    eval_fn = jax.jit(make_soft_intro_eval_step(
        model, loss_cfg, cfg.input_shape, val_eps=0.0,
        zero_noise=True, fixed_noise=fixed,
        val_loss_multiplier=10.0))  # trainer_fc val keeps the x10 (:374,396)

    xj = jnp.asarray(np.moveaxis(x_train, 1, -1))
    xv = jnp.asarray(np.moveaxis(x_val, 1, -1))
    for i in range(meta["steps"]):
        state, metrics = step_fn(state, xj)
        vm = eval_fn(state, xv, jax.random.key(0))
        print(f"step {i}: lossE {float(metrics['lossE']):.6f} "
              f"(ref {g['lossE'][i]:.6f}, "
              f"rel {abs(float(metrics['lossE']) / g['lossE'][i] - 1):.2e}) "
              f"lossD {float(metrics['lossD']):.6f} "
              f"(ref {g['lossD'][i]:.6f}, "
              f"rel {abs(float(metrics['lossD']) / g['lossD'][i] - 1):.2e}) "
              f"valE {float(vm['lossE']):.4f} (ref {g['val_lossE'][i]:.4f}) "
              f"valD {float(vm['lossD']):.4f} (ref {g['val_lossD'][i]:.4f})",
              flush=True)

    def moments(prefix, module_prefix, src, kind):
        final_sd = sub(src, "final/")
        fake = dict(final_sd)
        for k in src.files:
            if k.startswith(prefix) and k.endswith("." + kind):
                pname = k[len(prefix):-len("." + kind)]
                fake[f"{module_prefix}.{pname}"] = src[k]
        return import_fc_soft_intro_vae(fake, cfg, variables)

    adam_e, adam_d = state.opt_e[0], state.opt_d[0]
    for side, mod, adam in (("enc", "encoder", adam_e),
                            ("dec", "decoder", adam_d)):
        for kind, ours_tree in (("exp_avg", adam.mu), ("exp_avg_sq", adam.nu)):
            ref = moments(f"adam_{'e' if side == 'enc' else 'd'}/",
                          mod, g, kind)[side]["params"]
            cha = (moments(f"adam_{'e' if side == 'enc' else 'd'}/", mod,
                           pert, kind)[side]["params"]
                   if pert is not None else None)
            flat_o = tree_leaves_with_path(ours_tree)
            flat_r = jax.tree_util.tree_leaves(ref)
            flat_c = (jax.tree_util.tree_leaves(cha) if cha is not None
                      else [None] * len(flat_r))
            rows = []
            for (path, o), r, c in zip(flat_o, flat_r, flat_c):
                o = np.asarray(o, np.float64)
                r = np.asarray(r, np.float64)
                err = np.linalg.norm(o - r)
                mag = np.linalg.norm(r)
                noise = (1e-4 if kind == "exp_avg" else 1e-8) * np.sqrt(o.size)
                chaos = (3.0 * np.linalg.norm(np.asarray(c, np.float64) - r)
                         if c is not None else 0.0)
                tol = 0.15 * mag + noise + chaos + (0.0 if kind == "exp_avg" else 1e-12)
                rows.append((err / tol if tol else 0.0, keystr(path), err,
                             tol, mag, chaos))
            rows.sort(reverse=True)
            print(f"--- {side} {kind}: worst 6 of {len(rows)} ---")
            for ratio, name, err, tol, mag, chaos in rows[:6]:
                print(f"  {'FAIL' if ratio > 1 else 'ok  '} ratio {ratio:8.2f} "
                      f"err {err:.3e} tol {tol:.3e} mag {mag:.3e} "
                      f"chaos {chaos:.3e}  {name}", flush=True)


if __name__ == "__main__":
    main()
