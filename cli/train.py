"""Training CLI — covers the reference's five entry scripts with one tool.

Experiment presets — each maps to ONE exact reference invocation:
  z1200      <- z-1200main.py:158,202: models.SoftIntroVAE(64,[[64,1,2],
               [128,1,2],[256,2,2]]), beta_kl=.75, beta_neg=1024, no aug
  aug-z1200  <- aug-z-1200main.py:167: same model + RandomAffine(10deg) p=.35
  z600       <- 600z_main.py:176 AS RUN: mymodel.SoftIntroVAE(12,24,32,48,150)
               — z=150 despite the script name (the 600-d ctor is only a
               comment, :54) — beta_kl=.7, RandomAffine(15deg) p=.6
  z600-wide  <- 600z_main.py:54's documented-but-commented variant
               "(16,32,64,128,600)": the true 600-d FC model, same betas/aug
  z150       <- main.py:139: models.SoftIntroVAE(12,[[12,1,2],[24,1,2],
               [32,2,2],[48,2,2]]), no aug
  vae        <- vae_main.py:180,205: vaemodel.ResNetVAE + RandomNoise p=.5,
               mse_w/kl_w from CLI
  cae        <- main.py:131 --model ResNetCAE
  vae2soft   <- main.py:185-192 VAEtoSoftVAE (VAE pretrain -> warm-start)
  dp-variant <- main_DataParallel.py:470,617: the DataParallel trainer's
               loss variant (0.25*expELBO, no x10, scale 1/614400,
               beta_neg=256, beta_kl=1) on the spatial-150 model

beta_* defaults come from the preset; --beta-rec/--beta-neg/--beta-kl/
--gamma-r override them (reference exposes these as argparse args too,
z-1200main.py:46-48).

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

from sivae_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

PRESETS = {
    "z1200": dict(model="spatial_1200", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                  augment=None, trainer="soft_intro"),
    "aug-z1200": dict(model="spatial_1200", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                      augment=("affine", 10.0, 0.35), trainer="soft_intro"),
    # 600z_main.py:176 constructs mymodel.SoftIntroVAE(12,24,32,48,150) —
    # z=150 with the small channel walk; the "600" in the filename refers to
    # the commented-out ctor at :54. z600 reproduces the run; z600-wide is
    # the documented 600-d variant.
    "z600": dict(model="fc_150", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.7,
                 augment=("affine", 15.0, 0.6), trainer="soft_intro"),
    "z600-wide": dict(model="fc_600", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.7,
                      augment=("affine", 15.0, 0.6), trainer="soft_intro"),
    "z150": dict(model="spatial_150", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                 augment=None, trainer="soft_intro"),
    # vae_main.py:53-54 defaults mse_weight=1, kl_weight=1 (NOT the
    # normal_loss kldw=10 default, which only applies to the val-side call)
    "vae": dict(model="vae_150", augment=("noise", 0.03, 0.5), trainer="vae",
                mse_w=1.0, kl_w=1.0),
    "cae": dict(model="cae_150", augment=None, trainer="cae"),
    "vae2soft": dict(model="spatial_150", beta_rec=1.0, beta_neg=1024.0, beta_kl=0.75,
                     augment=None, trainer="vae2soft", mse_w=1.0, kl_w=20.0),
    # main_DataParallel.py:470,617: the DataParallel trainer's loss variant —
    # expELBO weight 0.25, no x10 multiplier, scale 1/(80*96*80) (:411),
    # beta_neg=256, beta_kl=1.0, spatial-150 model (:605), batch 16 (:46)
    "dp-variant": dict(model="spatial_150", beta_rec=1.0, beta_neg=256.0,
                       beta_kl=1.0, augment=None, trainer="soft_intro",
                       exp_elbo_weight=0.25, loss_multiplier=1.0,
                       scale=1.0 / (80 * 96 * 80), dp_semantics=True),
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


def apply_health_gate(model, cfg, val_source, run_dir, batch):
    """Post-training health gate (VERDICT r4 next-#5): checkpoint-sweep the
    val split and apply the frozen r4 criterion. Exits 1 if unhealthy, so a
    training job's exit code certifies the run."""
    import numpy as np

    from sivae_tpu.data.preprocess import preprocess_voxel_np
    from sivae_tpu.eval.sweep import run_health, sweep_checkpoints

    vox = np.stack([preprocess_voxel_np(v) for v in val_source.voxels])[..., None]
    sweep = sweep_checkpoints(
        model, cfg, vox,
        ckpt_dir=os.path.abspath(os.path.join(run_dir, "ckpt")),
        batch_size=batch)
    with open(os.path.join(run_dir, "sweep.json"), "w") as f:
        json.dump(sweep, f, indent=2)
    health = run_health(sweep)  # frozen r4 thresholds (the defaults)
    with open(os.path.join(run_dir, "health.json"), "w") as f:
        json.dump(health, f, indent=2)
    print("health gate:", json.dumps(health))
    if not health["healthy"]:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="z1200")
    ap.add_argument("--model", default=None,
                    help="override the preset's model config (registry name)")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--milestones", type=int, nargs="*", default=None,
                    help="LR x0.1 epoch milestones (reference MultiStepLR "
                         "milestone 350, my_trainer.py:185-186)")
    ap.add_argument("--beta-rec", type=float, default=None,
                    help="override the preset's beta_rec")
    ap.add_argument("--beta-neg", type=float, default=None)
    ap.add_argument("--beta-kl", type=float, default=None)
    ap.add_argument("--gamma-r", type=float, default=None)
    ap.add_argument("--mse-w", type=float, default=None,
                    help="VAE trainer mse weight (vae_main.py:53, default 1)")
    ap.add_argument("--kl-w", type=float, default=None,
                    help="VAE trainer kl weight (vae_main.py:54, default 1)")
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
    ap.add_argument("--keep-checkpoints", type=int, default=3,
                    help="orbax max_to_keep (raise for checkpoint sweeps)")
    def positive_int(s):
        v = int(s)
        if v <= 0:
            raise argparse.ArgumentTypeError(f"must be a positive int, got {v}")
        return v

    ap.add_argument("--checkpoint-every", type=positive_int, default=None,
                    help="checkpoint cadence in epochs (default: each "
                         "trainer's reference cadence — every epoch for "
                         "soft-intro, my_trainer.py:476-480; every 10 for "
                         "vae/cae, my_trainer.py:628)")
    ap.add_argument("--pretrained", default=None,
                    help="torch .pth or orbax dir for warm start")
    ap.add_argument("--health-gate", action="store_true",
                    help="after soft-intro training, sweep the run's "
                         "checkpoints on the val split and apply the FROZEN "
                         "r4 long-run health criterion (eval/sweep.py "
                         "run_health: drift_frac=0.3, min_ssim3d=0.2); "
                         "writes sweep.json + health.json into the run dir "
                         "and exits 1 if unhealthy")
    args = ap.parse_args()

    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from sivae_tpu.config import (OptimConfig, SoftIntroLossConfig, TrainConfig, to_json)
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.loop import SoftIntroTrainer, VAETrainer

    preset = PRESETS[args.preset]
    if args.health_gate and preset["trainer"] in ("vae", "cae"):
        ap.error("--health-gate applies to the soft-intro trainers only "
                 "(the criterion is calibrated on adversarial drift)")
    cfg = get_model_config(args.model or preset["model"])
    if args.bf16:
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    run_dir = args.run_dir or f"./runs/{args.preset}"
    os.makedirs(run_dir, exist_ok=True)

    train, val, mesh = build_pipelines(args, cfg.input_shape,
                                       augment_spec=preset.get("augment"))
    model = make_model(cfg)
    optim_cfg = OptimConfig(lr=args.lr)
    if args.milestones is not None:
        optim_cfg = dataclasses.replace(optim_cfg,
                                        milestones=tuple(args.milestones))
    train_cfg = TrainConfig(epochs=args.epochs, batch_size=args.batch,
                            seed=args.seed,
                            checkpoint_every_epochs=(args.checkpoint_every
                                                     if args.checkpoint_every is not None else 1))

    # args snapshot (reference my_args.txt, main.py:152-153)
    with open(os.path.join(run_dir, "args.json"), "w") as f:
        json.dump({**vars(args), "model_config": to_json(cfg)}, f, indent=2, default=str)

    if preset["trainer"] == "cae":
        from sivae_tpu.train.loop import CAETrainer

        trainer = CAETrainer(cfg, optim_cfg, train_cfg, run_dir=run_dir,
                             steps_per_epoch=train.steps_per_epoch, mesh=mesh,
                             keep_checkpoints=args.keep_checkpoints,
                             checkpoint_every=(args.checkpoint_every
                                               if args.checkpoint_every is not None else 10))
        trainer.fit(train, val, epochs=args.epochs)
        return

    if preset["trainer"] == "vae":
        trainer = VAETrainer(model, cfg, optim_cfg, train_cfg,
                             mse_w=(args.mse_w if args.mse_w is not None
                                    else preset["mse_w"]),
                             kl_w=(args.kl_w if args.kl_w is not None
                                   else preset["kl_w"]),
                             run_dir=run_dir, steps_per_epoch=train.steps_per_epoch,
                             mesh=mesh, keep_checkpoints=args.keep_checkpoints,
                             checkpoint_every=(args.checkpoint_every
                                               if args.checkpoint_every is not None else 10))
        trainer.fit(train, val, epochs=args.epochs)
        return

    loss_cfg = SoftIntroLossConfig(
        beta_rec=(args.beta_rec if args.beta_rec is not None
                  else preset.get("beta_rec", 1.0)),
        beta_neg=(args.beta_neg if args.beta_neg is not None
                  else preset.get("beta_neg", 1024.0)),
        beta_kl=(args.beta_kl if args.beta_kl is not None
                 else preset.get("beta_kl", 0.75)),
        exp_elbo_weight=preset.get("exp_elbo_weight", 0.5),
        loss_multiplier=preset.get("loss_multiplier", 10.0),
        scale=preset.get("scale"),
        dp_semantics=preset.get("dp_semantics", False))
    if args.gamma_r is not None:
        loss_cfg = dataclasses.replace(loss_cfg, gamma_r=args.gamma_r)

    if preset["trainer"] == "vae2soft":
        # two-stage pipeline (main.py:185-192): VAE pretrain, warm-start S-IntroVAE
        vtr = VAETrainer(model, cfg, optim_cfg, train_cfg,
                         mse_w=preset["mse_w"], kl_w=preset["kl_w"],
                         run_dir=os.path.join(run_dir, "vae_stage"),
                         steps_per_epoch=train.steps_per_epoch, mesh=mesh,
                         keep_checkpoints=args.keep_checkpoints,
                         checkpoint_every=(args.checkpoint_every
                                               if args.checkpoint_every is not None else 10))
        vtr.fit(train, val, epochs=max(1, args.epochs // 5))
        trainer = SoftIntroTrainer(model, cfg, loss_cfg, optim_cfg, train_cfg,
                                   run_dir=run_dir,
                                   steps_per_epoch=train.steps_per_epoch, mesh=mesh)
        trainer.state = trainer.state.replace(
            enc_params=vtr.state.enc_params, dec_params=vtr.state.dec_params,
            enc_stats=vtr.state.enc_stats, dec_stats=vtr.state.dec_stats)
        trainer.fit(train, val, epochs=args.epochs)
        if args.health_gate:
            apply_health_gate(model, cfg, val.source, run_dir, args.batch)
        return

    trainer = SoftIntroTrainer(model, cfg, loss_cfg, optim_cfg, train_cfg,
                               run_dir=run_dir,
                               steps_per_epoch=train.steps_per_epoch, mesh=mesh,
                               keep_checkpoints=args.keep_checkpoints)
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
    if args.health_gate:
        apply_health_gate(model, cfg, val.source, run_dir, args.batch)


if __name__ == "__main__":
    main()
