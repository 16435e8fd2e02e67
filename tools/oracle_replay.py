"""Replay the oracle fixture's 5 steps and DUMP our final state to npz.

Diagnosis aid for tests/test_reference_oracle.py: the test stops at the
first failing leaf, hiding the full error distribution. This script runs
the identical 5 jitted two-phase steps from the golden init (no val evals
— ~40% cheaper) and writes every final param / BN stat / Adam moment to
/tmp/oracle_ours.npz keyed by flax leaf path, so per-leaf comparisons
against the golden (and its perturbed sensitivity runs) are offline and
free afterwards.

Usage: JAX_PLATFORMS=cpu python tools/oracle_replay.py  (~35 min, 1 core)
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sivae_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu()

import jax  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-fuse-upconv", action="store_true",
                    help="A/B: run the decoder with materialized "
                         "upsample+conv instead of the fused op")
    ap.add_argument("--out", default="/tmp/oracle_ours.npz")
    ap.add_argument("--steps", type=int, default=None,
                    help="override step count (default: meta['steps']; "
                         "use 1 to calibrate the s1 golden)")
    ap.add_argument("--stem", default="reference_oracle",
                    help="golden file stem to replay from (e.g. "
                         "reference_oracle_s1) — inits, betas and step "
                         "count all come from that file pair")
    cli = ap.parse_args()

    from jax.tree_util import keystr, tree_leaves_with_path

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig, SpatialVAEConfig
    from sivae_tpu.models.registry import make_model
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step
    from sivae_tpu.utils.torch_import import import_spatial_soft_intro_vae

    golden_dir = os.path.join(REPO, "tests", "golden")
    data = np.load(os.path.join(golden_dir, cli.stem + ".npz"))
    with open(os.path.join(golden_dir, cli.stem + ".json")) as f:
        meta = json.load(f)

    cfg = SpatialVAEConfig(
        in_ch=meta["in_ch"],
        block_setting=tuple(tuple(b) for b in meta["block_setting"]),
        input_shape=tuple(meta["input_shape"]))
    cfg = dataclasses.replace(cfg, act=cfg.act.with_no_dropout())
    if cli.no_fuse_upconv:
        cfg = dataclasses.replace(cfg, fuse_upconv=False)
    model = make_model(cfg)

    rng = np.random.RandomState(meta["data_seed"])
    x_train = rng.rand(meta["batch"], 1, *cfg.input_shape).astype(np.float32)
    assert hashlib.sha256(x_train.tobytes()).hexdigest() == meta["x_train_sha256"]

    x0 = jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32)
    variables = model.init(jax.random.key(0), x0)
    init_sd = {k[len("init/"):]: data[k] for k in data.files
               if k.startswith("init/")}
    imported = import_spatial_soft_intro_vae(init_sd, cfg, variables)

    state = create_train_state(model, jax.random.key(1), x0, OptimConfig(),
                               steps_per_epoch=1)
    state = state.replace(
        enc_params=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["params"]),
        dec_params=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["params"]),
        enc_stats=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["batch_stats"]),
        dec_stats=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["batch_stats"]))

    loss_cfg = SoftIntroLossConfig(
        beta_rec=meta["beta_rec"], beta_neg=meta["beta_neg"],
        beta_kl=meta["beta_kl"])
    # the golden records how the generator stubbed torch.randn: "zero"
    # (noise batch = 0) or "fixed" (seeded nonzero batch, torch NCDHW) —
    # reproduce the identical batch here (reparam eps stays zero either way)
    noise_meta = meta.get("noise", {"kind": "zero"})
    fixed = None
    if noise_meta["kind"] == "fixed":
        d, h, w = cfg.latent_spatial_shape
        vals = np.random.RandomState(noise_meta["seed"]).randn(
            meta["batch"], 1, d, h, w).astype(np.float32)
        fixed = jnp.asarray(np.moveaxis(vals, 1, -1))
    step = jax.jit(make_soft_intro_train_step(
        model, loss_cfg, OptimConfig(), 1, cfg.input_shape, zero_noise=True,
        fixed_noise=fixed))

    xj = jnp.asarray(np.moveaxis(x_train, 1, -1))
    losses = []
    for i in range(cli.steps or meta["steps"]):
        state, metrics = step(state, xj)
        losses.append((float(metrics["lossE"]), float(metrics["lossD"])))
        print(f"step {i}: lossE={losses[-1][0]:.6f} lossD={losses[-1][1]:.6f}",
              flush=True)

    arrays = {}
    adam_e, adam_d = state.opt_e[0], state.opt_d[0]
    for name, tree in (("enc_params", state.enc_params),
                       ("dec_params", state.dec_params),
                       ("enc_stats", state.enc_stats),
                       ("dec_stats", state.dec_stats),
                       ("adam_e_mu", adam_e.mu), ("adam_e_nu", adam_e.nu),
                       ("adam_d_mu", adam_d.mu), ("adam_d_nu", adam_d.nu)):
        for path, leaf in tree_leaves_with_path(tree):
            arrays[f"{name}/{keystr(path)}"] = np.asarray(leaf)
    out = cli.out
    np.savez_compressed(out, **arrays)
    print("losses:", losses)
    print("wrote", out)


if __name__ == "__main__":
    main()
