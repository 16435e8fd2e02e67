"""Epoch driver: the TPU-native `train_soft_intro_vae` / `train_ResNetVAE`.

Replaces reference utils/my_trainer.py:147-508 / :557-652 and
utils/trainer_fc.py (the FC-latent twin — here the same loop works for both
families since the latent shape lives in the model bundle).

Differences from the reference, by design:
- ONE jitted step per batch instead of ~12 eager forwards + 2 backwards;
- metrics accumulate on device; host sync happens once per epoch
  (the reference calls .item() per batch, forcing a device sync each time);
- NaN abort is checked from the epoch-level aggregate (reference raises
  SystemError per batch, my_trainer.py:327-328 — we raise FloatingPointError
  at epoch end);
- checkpoints carry the full train state (optimizers included).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sivae_tpu.config import (
    OptimConfig,
    SoftIntroLossConfig,
    TrainConfig,
)
from sivae_tpu.train.state import SIVAETrainState, create_train_state
from sivae_tpu.train.step import (
    make_cae_train_step,
    make_classifier_eval_step,
    make_classifier_train_step,
    make_soft_intro_eval_step,
    make_soft_intro_train_step,
    make_vae_eval_step,
    make_vae_train_step,
)
from sivae_tpu.utils.logging import MetricsLogger
from sivae_tpu.utils.checkpoint import CheckpointManager
from sivae_tpu.utils.plots import (
    plot_kl_stats,
    plot_soft_intro_losses,
    save_recon_panel,
)


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


class SoftIntroTrainer:
    """Owns state + jitted steps + logging for Soft-IntroVAE training."""

    def __init__(
        self,
        model,
        model_cfg,
        loss_cfg: SoftIntroLossConfig = SoftIntroLossConfig(),
        optim_cfg: OptimConfig = OptimConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        run_dir: str = "./runs/soft_intro",
        steps_per_epoch: int = 1,
        mesh=None,
        keep_checkpoints: int = 3,
    ):
        self.model = model
        self.model_cfg = model_cfg
        self.loss_cfg = loss_cfg
        self.train_cfg = train_cfg
        self.run_dir = run_dir
        self.mesh = mesh
        os.makedirs(run_dir, exist_ok=True)
        self.logger = MetricsLogger(run_dir)
        self.ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"),
                                      max_to_keep=keep_checkpoints)

        sample = jnp.zeros((1,) + tuple(model_cfg.input_shape) + (1,), jnp.float32)
        self.state = create_train_state(
            model, jax.random.key(train_cfg.seed), sample, optim_cfg, steps_per_epoch)
        if mesh is not None:
            from sivae_tpu.parallel.mesh import replicate_state

            self.state = replicate_state(self.state, mesh)
        self._step = jax.jit(
            make_soft_intro_train_step(
                model, loss_cfg, optim_cfg, steps_per_epoch, model_cfg.input_shape),
            donate_argnums=(0,))
        self._eval = jax.jit(
            make_soft_intro_eval_step(
                model, loss_cfg, model_cfg.input_shape, val_eps=train_cfg.val_eps))
        self.n_voxels = int(np.prod(model_cfg.input_shape))

    # -- warm start (reference pretrained_path, my_trainer.py:179-180) ------
    def try_resume(self) -> Optional[int]:
        latest = self.ckpt.latest_step()
        if latest is not None:
            self.state = self.ckpt.restore(self.state, latest)
            return latest
        return None

    def train_epoch(self, pipeline, epoch: int) -> Dict[str, float]:
        sums = None
        steps = 0
        for vox, _ in pipeline.epoch(epoch):
            self.state, metrics = self._step(self.state, vox)
            sums = metrics if sums is None else _tree_add(sums, metrics)
            steps += 1
        host = {k: float(v) for k, v in jax.device_get(sums).items()}
        if host.pop("nan", 0.0) > 0:
            raise FloatingPointError(
                f"NaN in lossE/lossD during epoch {epoch} "
                "(reference raises SystemError, my_trainer.py:327-328)")
        avg = {k: v / steps for k, v in host.items()}
        # RMSE per reference my_trainer.py:353-354
        avg["rmse"] = float(np.sqrt(avg["loss_rec"] / self.n_voxels))
        return avg

    def eval_epoch(self, pipeline, epoch: int) -> Dict[str, float]:
        sums = None
        steps = 0
        rng = jax.random.key(self.train_cfg.seed * 1000 + epoch)
        for vox, _ in pipeline.epoch(0):  # val order fixed (no shuffle anyway)
            rng, sub = jax.random.split(rng)
            metrics = self._eval(self.state, vox, sub)
            sums = metrics if sums is None else _tree_add(sums, metrics)
            steps += 1
        if steps == 0:
            return {}
        avg = {k: float(v) / steps for k, v in jax.device_get(sums).items()}
        avg["rmse"] = float(np.sqrt(avg["loss_rec"] / self.n_voxels))
        return avg

    def _variables(self):
        return {"enc": {"params": self.state.enc_params,
                        "batch_stats": self.state.enc_stats},
                "dec": {"params": self.state.dec_params,
                        "batch_stats": self.state.dec_stats}}

    def save_panels(self, pipeline, epoch: int, val_pipeline=None) -> None:
        """Recon/fake panels from the train batch, and — matching the
        reference's in-training val panels (my_trainer.py:455-463) — a
        val-set original/recon panel when a val pipeline is given."""
        vox, _ = pipeline.first_batch()
        (mu, logvar, z, rec), _ = self.model.forward(
            self._variables(),
            vox, jax.random.key(epoch), train=False, val_eps=self.train_cfg.val_eps)
        img_dir = os.path.join(self.run_dir, "imgs")
        save_recon_panel(np.asarray(vox), np.asarray(rec),
                         os.path.join(img_dir, f"rec_epoch{epoch}.jpg"))
        fake = self.model.sample_with_noise(
            self._variables(),
            jax.random.key(epoch + 1), num_samples=min(8, vox.shape[0]))
        save_recon_panel(np.asarray(vox), np.asarray(fake),
                         os.path.join(img_dir, f"fake_epoch{epoch}.jpg"))
        if val_pipeline is not None:
            vvox, _ = val_pipeline.first_batch()
            (_, _, _, vrec), _ = self.model.forward(
                self._variables(),
                vvox, jax.random.key(epoch), train=False,
                val_eps=self.train_cfg.val_eps)
            save_recon_panel(
                np.asarray(vvox), np.asarray(vrec),
                os.path.join(self.run_dir, "val_imgs", f"val_rec_epoch{epoch}.jpg"))

    def fit(self, train_pipeline, val_pipeline=None, epochs: Optional[int] = None,
            verbose: bool = True) -> Dict[str, List[float]]:
        epochs = epochs if epochs is not None else self.train_cfg.epochs
        tc = self.train_cfg
        for epoch in range(epochs):
            t0 = time.time()
            train_m = self.train_epoch(train_pipeline, epoch)
            val_m = {}
            if val_pipeline is not None and (epoch % tc.eval_every_epochs == 0):
                val_m = self.eval_epoch(val_pipeline, epoch)
            self.logger.append(
                train_lossE=train_m["lossE"], train_lossD=train_m["lossD"],
                val_lossE=val_m.get("lossE", float("nan")),
                val_lossD=val_m.get("lossD", float("nan")),
                kls_real=train_m["kl_real"], kls_fake=train_m["fake_kl"],
                kls_rec=train_m["rec_kl"], rec_errs=train_m["loss_rec"],
                train_rmse=train_m["rmse"], val_rmse=val_m.get("rmse", float("nan")),
            )
            self.logger.write_epoch(epoch, {
                "train_lossE": train_m["lossE"], "train_lossD": train_m["lossD"],
                "val_lossE": val_m.get("lossE", float("nan")),
                "val_lossD": val_m.get("lossD", float("nan")),
                "train_rmse": train_m["rmse"], "val_rmse": val_m.get("rmse", float("nan")),
                "kls_real": train_m["kl_real"], "kls_fake": train_m["fake_kl"],
                "kls_rec": train_m["rec_kl"],
            })
            self.logger.write_loss_txt()
            self.logger.write_kl_txt()
            if epoch % tc.checkpoint_every_epochs == 0:
                self.ckpt.save(epoch, self.state)
            if tc.log_images_every_epochs and epoch % tc.log_images_every_epochs == 0:
                try:
                    self.save_panels(train_pipeline, epoch,
                                     val_pipeline=val_pipeline)
                except Exception as e:  # panels are best-effort observability
                    print(f"[warn] recon panel failed: {e}")
            if verbose:
                print(self.logger.epoch_line(epoch, epochs, train_m, val_m,
                                             time.time() - t0), flush=True)
        plot_soft_intro_losses(self.logger.history, self.run_dir)
        plot_kl_stats(self.logger.history, self.run_dir)
        self.ckpt.close()
        return self.logger.history


class CAETrainer:
    """Convolutional autoencoder trainer (reference train_ResNetCAE,
    my_trainer.py:763-823: joint Adam, elementwise-mean MSE)."""

    def __init__(self, model_cfg, optim_cfg: OptimConfig = OptimConfig(),
                 train_cfg: TrainConfig = TrainConfig(), run_dir: str = "./runs/cae",
                 steps_per_epoch: int = 1, mesh=None, keep_checkpoints: int = 3,
                 checkpoint_every: int = 10):
        import dataclasses as _dc

        from sivae_tpu.models.resnet_vae import SpatialDecoder, SpatialEncoder
        from sivae_tpu.train.state import make_optimizer

        model_cfg = _dc.replace(model_cfg, variational=False)
        self.encoder = SpatialEncoder(model_cfg)
        self.decoder = SpatialDecoder(model_cfg)
        self.train_cfg = train_cfg
        self.run_dir = run_dir
        self.checkpoint_every = checkpoint_every
        os.makedirs(run_dir, exist_ok=True)
        self.logger = MetricsLogger(run_dir, csv_columns=["epoch", "train_loss", "val_loss"])
        self.ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"),
                                      max_to_keep=keep_checkpoints)
        key = jax.random.key(train_cfg.seed)
        x = jnp.zeros((1,) + tuple(model_cfg.input_shape) + (1,), jnp.float32)
        ev = self.encoder.init({"params": key, "dropout": key}, x)
        z = self.encoder.apply(ev, x, train=False)
        dv = self.decoder.init({"params": jax.random.fold_in(key, 1), "dropout": key}, z)
        opt = make_optimizer(optim_cfg, steps_per_epoch)
        params = (ev["params"], dv["params"])
        self.state = SIVAETrainState(
            enc_params=ev["params"], dec_params=dv["params"],
            enc_stats=ev.get("batch_stats", {}), dec_stats=dv.get("batch_stats", {}),
            opt_e=opt.init(params), opt_d=(),
            rng=jax.random.fold_in(key, 2), step=jnp.zeros((), jnp.int32))
        if mesh is not None:
            from sivae_tpu.parallel.mesh import replicate_state

            self.state = replicate_state(self.state, mesh)
        self._step = jax.jit(
            make_cae_train_step(self.encoder, self.decoder, optim_cfg, steps_per_epoch),
            donate_argnums=(0,))

    def _eval_loss(self, vox):
        @jax.jit
        def f(state, x):
            ev = {"params": state.enc_params, "batch_stats": state.enc_stats}
            dv = {"params": state.dec_params, "batch_stats": state.dec_stats}
            z = self.encoder.apply(ev, x, train=False)
            out = self.decoder.apply(dv, z, train=False)
            return jnp.mean((out.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)

        return f(self.state, vox)

    def fit(self, train_pipeline, val_pipeline=None, epochs: int = 1,
            verbose: bool = True):
        for epoch in range(epochs):
            t0 = time.time()
            sums, steps = None, 0
            for vox, _ in train_pipeline.epoch(epoch):
                self.state, m = self._step(self.state, vox)
                sums = m if sums is None else _tree_add(sums, m)
                steps += 1
            train_m = {k: float(v) / steps for k, v in jax.device_get(sums).items()}
            if train_m.pop("nan", 0.0) > 0:
                raise FloatingPointError(f"NaN during epoch {epoch}")
            val_loss = float("nan")
            if val_pipeline is not None:
                vs = [float(self._eval_loss(vox)) for vox, _ in val_pipeline.epoch(0)]
                val_loss = float(np.mean(vs)) if vs else float("nan")
            self.logger.append(train_loss=train_m["loss"], val_loss=val_loss)
            self.logger.write_epoch(epoch, {"train_loss": train_m["loss"],
                                            "val_loss": val_loss})
            if epoch % self.checkpoint_every == 0:
                self.ckpt.save(epoch, self.state)
            if verbose:
                print(f"Epoch[{epoch + 1}/{epochs}] train_loss:{train_m['loss']:.5f} "
                      f"val_loss:{val_loss:.5f} epoch:{time.time() - t0:.1f}s", flush=True)
        from sivae_tpu.utils.plots import plot_ae_losses

        plot_ae_losses(self.logger.history, self.run_dir)
        self.ckpt.close()
        return self.logger.history


class ClassifierTrainer:
    """CNN classifier trainer (reference `train`, my_trainer.py:829-910):
    Adam + CrossEntropy, per-epoch accuracy, confusion-matrix eval."""

    def __init__(self, model, model_cfg, optim_cfg: OptimConfig = OptimConfig(),
                 train_cfg: TrainConfig = TrainConfig(), run_dir: str = "./runs/clf",
                 steps_per_epoch: int = 1, mesh=None):
        self.model = model
        self.train_cfg = train_cfg
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.logger = MetricsLogger(
            run_dir, csv_columns=["epoch", "train_loss", "train_acc", "val_loss", "val_acc"])
        key = jax.random.key(train_cfg.seed)
        x = jnp.zeros((1,) + tuple(model_cfg.input_shape) + (1,), jnp.float32)
        variables = model.init({"params": key, "dropout": key}, x, train=False)
        from sivae_tpu.train.state import make_optimizer

        opt = make_optimizer(optim_cfg, steps_per_epoch)
        self.state = SIVAETrainState(
            enc_params=variables["params"], dec_params={},
            enc_stats=variables.get("batch_stats", {}), dec_stats={},
            opt_e=opt.init(variables["params"]), opt_d=(),
            rng=jax.random.fold_in(key, 1), step=jnp.zeros((), jnp.int32))
        if mesh is not None:
            from sivae_tpu.parallel.mesh import replicate_state

            self.state = replicate_state(self.state, mesh)
        self._step = jax.jit(
            make_classifier_train_step(model, optim_cfg, steps_per_epoch),
            donate_argnums=(0,))
        self._eval = jax.jit(make_classifier_eval_step(model))

    def fit(self, train_pipeline, val_pipeline=None, epochs: int = 1,
            verbose: bool = True):
        for epoch in range(epochs):
            t0 = time.time()
            sums, steps = None, 0
            for vox, lab in train_pipeline.epoch(epoch):
                self.state, m = self._step(self.state, vox, lab)
                sums = m if sums is None else _tree_add(sums, m)
                steps += 1
            tm = {k: float(v) / steps for k, v in jax.device_get(sums).items()}
            if tm.pop("nan", 0.0) > 0:
                raise FloatingPointError(f"NaN during epoch {epoch}")
            vm = {}
            if val_pipeline is not None:
                vsums, vsteps = None, 0
                for vox, lab in val_pipeline.epoch(0):
                    m, _ = self._eval(self.state, vox, lab)
                    vsums = m if vsums is None else _tree_add(vsums, m)
                    vsteps += 1
                vm = {k: float(v) / vsteps for k, v in jax.device_get(vsums).items()}
            self.logger.append(train_loss=tm["loss"], train_acc=tm["acc"],
                               val_loss=vm.get("loss", float("nan")),
                               val_acc=vm.get("acc", float("nan")))
            self.logger.write_epoch(epoch, {
                "train_loss": tm["loss"], "train_acc": tm["acc"],
                "val_loss": vm.get("loss", float("nan")),
                "val_acc": vm.get("acc", float("nan"))})
            if verbose:
                print(f"Epoch[{epoch + 1}/{epochs}] loss:{tm['loss']:.3f} "
                      f"acc:{tm['acc'] * 100:.1f}% val_acc:"
                      f"{vm.get('acc', float('nan')) * 100:.1f}% "
                      f"epoch:{time.time() - t0:.1f}s", flush=True)
        return self.logger.history

    def confusion_matrix(self, pipeline, class_map, path: str):
        from sivae_tpu.eval.confusion import make_confusion_matrix, predict_all

        preds, labels, acc = predict_all(self._eval, self.state, pipeline)
        cm = make_confusion_matrix(preds, labels, class_map, path)
        return cm, acc


class VAETrainer:
    """Plain ELBO trainer (reference train_ResNetVAE, my_trainer.py:557-652)."""

    def __init__(
        self,
        model,
        model_cfg,
        optim_cfg: OptimConfig = OptimConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        mse_w: float = 1.0,
        kl_w: float = 1.0,  # vae_main.py:54 default (kldw=10 is val-side only)
        run_dir: str = "./runs/vae",
        steps_per_epoch: int = 1,
        mesh=None,
        keep_checkpoints: int = 3,
        checkpoint_every: int = 10,  # reference cadence, my_trainer.py:628
    ):
        self.model = model
        self.train_cfg = train_cfg
        self.run_dir = run_dir
        self.checkpoint_every = checkpoint_every
        os.makedirs(run_dir, exist_ok=True)
        self.logger = MetricsLogger(
            run_dir, csv_columns=["epoch", "train_loss", "val_loss"])
        self.ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"),
                                      max_to_keep=keep_checkpoints)
        sample = jnp.zeros((1,) + tuple(model_cfg.input_shape) + (1,), jnp.float32)
        self.state = create_train_state(
            model, jax.random.key(train_cfg.seed), sample, optim_cfg,
            steps_per_epoch, joint_optimizer=True)
        if mesh is not None:
            from sivae_tpu.parallel.mesh import replicate_state

            self.state = replicate_state(self.state, mesh)
        self._step = jax.jit(
            make_vae_train_step(model, optim_cfg, steps_per_epoch, mse_w, kl_w),
            donate_argnums=(0,))
        self._eval = jax.jit(make_vae_eval_step(model))

    def fit(self, train_pipeline, val_pipeline=None, epochs: int = 1,
            verbose: bool = True) -> Dict[str, List[float]]:
        for epoch in range(epochs):
            t0 = time.time()
            sums, steps = None, 0
            for vox, _ in train_pipeline.epoch(epoch):
                self.state, m = self._step(self.state, vox)
                sums = m if sums is None else _tree_add(sums, m)
                steps += 1
            train_m = {k: float(v) / steps for k, v in jax.device_get(sums).items()}
            if train_m.pop("nan", 0.0) > 0:
                raise FloatingPointError(f"NaN during epoch {epoch}")
            val_m = {}
            if val_pipeline is not None:
                vsums, vsteps = None, 0
                rng = jax.random.key(epoch)
                for vox, _ in val_pipeline.epoch(0):
                    rng, sub = jax.random.split(rng)
                    m = self._eval(self.state, vox, sub)
                    vsums = m if vsums is None else _tree_add(vsums, m)
                    vsteps += 1
                val_m = {k: float(v) / vsteps for k, v in jax.device_get(vsums).items()}
            self.logger.append(train_loss=train_m["loss"],
                               val_loss=val_m.get("loss", float("nan")),
                               train_mse=train_m["mse"], train_kl=train_m["kl"])
            self.logger.write_epoch(epoch, {
                "train_loss": train_m["loss"], "val_loss": val_m.get("loss", float("nan"))})
            self.logger.write_mse_kl_txt("train_losses.txt", "train_mse", "train_kl")
            if epoch % self.checkpoint_every == 0:  # default 10 = reference cadence (my_trainer.py:628)
                self.ckpt.save(epoch, self.state)
            if verbose:
                print(f"Epoch[{epoch + 1}/{epochs}] "
                      f"train[loss:{train_m['loss']:.1f} mse:{train_m['mse']:.1f} "
                      f"kl:{train_m['kl']:.1f}] val[loss:{val_m.get('loss', float('nan')):.1f}] "
                      f"epoch:{time.time() - t0:.1f}s", flush=True)
        from sivae_tpu.utils.plots import plot_ae_losses

        plot_ae_losses(self.logger.history, self.run_dir)
        self.ckpt.close()
        return self.logger.history
