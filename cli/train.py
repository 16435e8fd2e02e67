"""Training CLI — covers the reference's five entry scripts with one tool.

Experiment presets (reference SURVEY §2.2):
  z1200      <- z-1200main.py   (spatial 1200-d, no augmentation)
  aug-z1200  <- aug-z-1200main.py (spatial 1200-d + random affine 10deg p=.35)
  z600       <- 600z_main.py    (FC 600-d + random affine 15deg p=.6)
  z150       <- main.py         (spatial 150-d)
  vae        <- vae_main.py     (plain ResNetVAE + random-noise aug)
  cae        <- main.py --model ResNetCAE
  vae2soft   <- main.py VAEtoSoftVAE (VAE pretrain -> warm-start S-IntroVAE)

Usage:
  python -m cli.train --preset z1200 --epochs 500 --data-root /data/radiology_datas
  python -m cli.train --preset z1200 --synthetic 64 --epochs 2   # smoke, no dataset
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "z1200": dict(model="spatial_1200", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                  augment=None, trainer="soft_intro"),
    "aug-z1200": dict(model="spatial_1200", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                      augment=("affine", 10.0, 0.35), trainer="soft_intro"),
    "z600": dict(model="fc_600", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.7,
                 augment=("affine", 15.0, 0.6), trainer="soft_intro"),
    "z150": dict(model="spatial_150", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                 augment=None, trainer="soft_intro"),
    "vae": dict(model="vae_150", augment=("noise", 0.03, 0.5), trainer="vae",
                mse_w=1.0, kl_w=20.0),
    "cae": dict(model="cae_150", augment=None, trainer="cae"),
    "vae2soft": dict(model="spatial_150", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                     augment=None, trainer="vae2soft", mse_w=1.0, kl_w=20.0),
}


def make_augment_fn(spec):
    """('affine', degrees, p) or ('noise', std, p) -> on-device batch fn."""
    if spec is None:
        return None
    kind, value, p = spec
    if kind == "affine":
        from sivae_tpu.data.augment import random_affine_batch

        return lambda key, vox: random_affine_batch(key, vox, degrees=value, p=p)
    if kind == "noise":
        from sivae_tpu.data.augment import random_noise_batch

        return lambda key, vox: random_noise_batch(key, vox, mean=value, std=value, p=p)
    raise ValueError(f"unknown augment kind {kind!r}")


def build_pipelines(args, input_shape, augment_spec=None):
    from sivae_tpu.data.pipeline import BrainDataSource, DataPipeline, grouped_split
    from sivae_tpu.parallel.mesh import make_mesh

    mesh = make_mesh() if args.data_parallel else None

    if args.synthetic:
        from sivae_tpu.data.synthetic import SyntheticBrainSource

        records = list(SyntheticBrainSource(args.synthetic, input_shape, seed=82))
    else:
        from sivae_tpu.data.catalog import load_data

        records = load_data(
            kinds=["ADNI2", "ADNI2-2"],
            classes=["CN", "AD", "EMCI", "LMCI", "SMC", "MCI"],
            blacklist=True, root=args.data_root)
    src = BrainDataSource(records)
    labels = src.labels
    tid, vid = grouped_split(labels, src.pids, n_splits=5, split_index=4,
                             seed=args.seed_split)
    # augmentation applies to the train split only (reference passes
    # transform=None for val, 600z_main.py:138)
    train = DataPipeline(src.subset(tid), args.batch, mesh=mesh, seed=args.seed_split,
                         augment=make_augment_fn(augment_spec))
    val = DataPipeline(src.subset(vid), args.batch, mesh=mesh, shuffle=False)
    return train, val, mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="z1200")
    ap.add_argument("--model", default=None,
                    help="override the preset's model config (registry name)")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--data-root", default="/data/radiology_datas")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="use N synthetic volumes instead of the dataset")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--seed-split", type=int, default=103)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--data-parallel", action="store_true", default=True)
    ap.add_argument("--no-data-parallel", dest="data_parallel", action="store_false")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--pretrained", default=None,
                    help="torch .pth or orbax dir for warm start")
    args = ap.parse_args()

    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from sivae_tpu.config import (OptimConfig, SoftIntroLossConfig, TrainConfig, to_json)
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.loop import SoftIntroTrainer, VAETrainer

    preset = PRESETS[args.preset]
    cfg = get_model_config(args.model or preset["model"])
    if args.bf16:
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    run_dir = args.run_dir or f"./runs/{args.preset}"
    os.makedirs(run_dir, exist_ok=True)

    train, val, mesh = build_pipelines(args, cfg.input_shape,
                                       augment_spec=preset.get("augment"))
    model = make_model(cfg)
    optim_cfg = OptimConfig(lr=args.lr)
    train_cfg = TrainConfig(epochs=args.epochs, batch_size=args.batch, seed=args.seed)

    # args snapshot (reference my_args.txt, main.py:152-153)
    with open(os.path.join(run_dir, "args.json"), "w") as f:
        json.dump({**vars(args), "model_config": to_json(cfg)}, f, indent=2, default=str)

    if preset["trainer"] == "cae":
        from sivae_tpu.train.loop import CAETrainer

        trainer = CAETrainer(cfg, optim_cfg, train_cfg, run_dir=run_dir,
                             steps_per_epoch=train.steps_per_epoch, mesh=mesh)
        trainer.fit(train, val, epochs=args.epochs)
        return

    if preset["trainer"] == "vae":
        trainer = VAETrainer(model, cfg, optim_cfg, train_cfg,
                             mse_w=preset["mse_w"], kl_w=preset["kl_w"],
                             run_dir=run_dir, steps_per_epoch=train.steps_per_epoch,
                             mesh=mesh)
        trainer.fit(train, val, epochs=args.epochs)
        return

    loss_cfg = SoftIntroLossConfig(
        beta_rec=preset.get("beta_rec", 1.0),
        beta_neg=preset.get("beta_neg", 1024.0),
        beta_kl=preset.get("beta_kl", 0.75))

    if preset["trainer"] == "vae2soft":
        # two-stage pipeline (main.py:185-192): VAE pretrain, warm-start S-IntroVAE
        vtr = VAETrainer(model, cfg, optim_cfg, train_cfg,
                         mse_w=preset["mse_w"], kl_w=preset["kl_w"],
                         run_dir=os.path.join(run_dir, "vae_stage"),
                         steps_per_epoch=train.steps_per_epoch, mesh=mesh)
        vtr.fit(train, val, epochs=max(1, args.epochs // 5))
        trainer = SoftIntroTrainer(model, cfg, loss_cfg, optim_cfg, train_cfg,
                                   run_dir=run_dir,
                                   steps_per_epoch=train.steps_per_epoch, mesh=mesh)
        trainer.state = trainer.state.replace(
            enc_params=vtr.state.enc_params, dec_params=vtr.state.dec_params,
            enc_stats=vtr.state.enc_stats, dec_stats=vtr.state.dec_stats)
        trainer.fit(train, val, epochs=args.epochs)
        return

    trainer = SoftIntroTrainer(model, cfg, loss_cfg, optim_cfg, train_cfg,
                               run_dir=run_dir,
                               steps_per_epoch=train.steps_per_epoch, mesh=mesh)
    if args.resume:
        resumed = trainer.try_resume()
        if resumed is not None:
            print(f"resumed from epoch {resumed}")
    elif args.pretrained and args.pretrained.endswith(".pth"):
        from sivae_tpu.utils.torch_import import import_torch_checkpoint

        variables = {"enc": {"params": trainer.state.enc_params,
                             "batch_stats": trainer.state.enc_stats},
                     "dec": {"params": trainer.state.dec_params,
                             "batch_stats": trainer.state.dec_stats}}
        imported = import_torch_checkpoint(args.pretrained, cfg, variables)
        trainer.state = trainer.state.replace(
            enc_params=imported["enc"]["params"], enc_stats=imported["enc"]["batch_stats"],
            dec_params=imported["dec"]["params"], dec_stats=imported["dec"]["batch_stats"])
        print(f"warm-started from {args.pretrained}")
    trainer.fit(train, val, epochs=args.epochs)


if __name__ == "__main__":
    main()
