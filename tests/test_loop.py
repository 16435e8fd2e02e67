"""End-to-end smoke test: 2-epoch Soft-IntroVAE + VAE training on synthetic
volumes with checkpointing, CSV/txt logging and resume (the TPU equivalent
of reference test.py's 1-epoch smoke run, SURVEY §4)."""

import os

import numpy as np
import pytest

from sivae_tpu.config import SoftIntroLossConfig, TrainConfig
from sivae_tpu.data.pipeline import BrainDataSource, DataPipeline
from sivae_tpu.data.synthetic import SyntheticBrainSource
from sivae_tpu.models.registry import get_model_config, make_model
from sivae_tpu.train.loop import SoftIntroTrainer, VAETrainer


@pytest.fixture(scope="module")
def pipes():
    cfg = get_model_config("tiny_spatial")
    src = BrainDataSource(SyntheticBrainSource(16, cfg.input_shape, seed=0).records)
    # preprocess on host so the pipeline emits normalized volumes directly
    train = DataPipeline(src.subset(np.arange(12)), batch_size=4, seed=1)
    val = DataPipeline(src.subset(np.arange(12, 16)), batch_size=4, shuffle=False)
    return cfg, train, val


def test_soft_intro_fit_smoke(pipes, tmp_path):
    cfg, train, val = pipes
    model = make_model(cfg)
    run_dir = str(tmp_path / "run")
    trainer = SoftIntroTrainer(
        model, cfg,
        loss_cfg=SoftIntroLossConfig(scale=8.0 / np.prod(cfg.input_shape)),
        train_cfg=TrainConfig(epochs=2, batch_size=4, log_images_every_epochs=2),
        run_dir=run_dir, steps_per_epoch=train.steps_per_epoch)
    history = trainer.fit(train, val, epochs=2)
    assert len(history["train_lossE"]) == 2
    assert np.isfinite(history["train_lossE"]).all()
    assert np.isfinite(history["val_lossE"]).all()
    # observability surface exists
    assert os.path.exists(os.path.join(run_dir, "train_result.csv"))
    assert os.path.exists(os.path.join(run_dir, "loss.txt"))
    assert os.path.exists(os.path.join(run_dir, "kl_losses.txt"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "soft_intro_losses.png"))
    assert os.path.exists(os.path.join(run_dir, "imgs", "rec_epoch0.jpg"))
    # checkpoint written with full state
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))


def test_soft_intro_resume(pipes, tmp_path):
    cfg, train, val = pipes
    run_dir = str(tmp_path / "resume_run")
    model = make_model(cfg)
    kw = dict(
        loss_cfg=SoftIntroLossConfig(scale=8.0 / np.prod(cfg.input_shape)),
        train_cfg=TrainConfig(epochs=1, batch_size=4, log_images_every_epochs=0),
        run_dir=run_dir, steps_per_epoch=train.steps_per_epoch)
    t1 = SoftIntroTrainer(model, cfg, **kw)
    t1.fit(train, None, epochs=1)
    t2 = SoftIntroTrainer(model, cfg, **kw)
    resumed = t2.try_resume()
    assert resumed == 0
    assert int(np.asarray(t2.state.step)) == train.steps_per_epoch


def test_vae_fit_smoke(pipes, tmp_path):
    cfg, train, val = pipes
    model = make_model(cfg)
    run_dir = str(tmp_path / "vae_run")
    trainer = VAETrainer(model, cfg, mse_w=1.0, kl_w=20.0, run_dir=run_dir,
                         steps_per_epoch=train.steps_per_epoch,
                         train_cfg=TrainConfig(epochs=2, batch_size=4))
    history = trainer.fit(train, val, epochs=2)
    assert len(history["train_loss"]) == 2
    assert np.isfinite(history["train_loss"]).all()
    assert os.path.exists(os.path.join(run_dir, "ae_losses.png"))
