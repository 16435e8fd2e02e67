"""Tests: classifier trainer + confusion matrix, lucky AE shapes."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sivae_tpu.config import TrainConfig
from sivae_tpu.data.pipeline import BrainDataSource, DataPipeline
from sivae_tpu.data.synthetic import SyntheticBrainSource
from sivae_tpu.models.classifier import ResNetClassifier
from sivae_tpu.models.lucky_ae import LuckyDecoder, LuckyEncoder
from sivae_tpu.models.registry import get_model_config
from sivae_tpu.train.loop import ClassifierTrainer


def test_classifier_fit_and_confusion(tmp_path):
    cfg = get_model_config("tiny_spatial")
    model = ResNetClassifier(cfg, num_classes=2)
    src = BrainDataSource(SyntheticBrainSource(16, cfg.input_shape, seed=0).records)
    train = DataPipeline(src, batch_size=4, seed=3)
    trainer = ClassifierTrainer(model, cfg, run_dir=str(tmp_path),
                                steps_per_epoch=train.steps_per_epoch,
                                train_cfg=TrainConfig(epochs=1, batch_size=4))
    hist = trainer.fit(train, train, epochs=1)
    assert np.isfinite(hist["train_loss"][0])
    assert 0.0 <= hist["train_acc"][0] <= 1.0
    cm, acc = trainer.confusion_matrix(
        train, {"CN": 0, "AD": 1}, str(tmp_path / "cm.png"))
    assert cm.shape == (2, 2)
    assert cm.sum() == 16
    assert os.path.exists(tmp_path / "cm.png")


def test_lucky_ae_shapes():
    enc = LuckyEncoder()
    dec = LuckyDecoder(bottleneck=(2, 3, 2))
    x = jnp.zeros((2, 16, 24, 16, 1))
    ev = enc.init({"params": jax.random.key(0)}, x)
    z = enc.apply(ev, x, train=False)
    # the lucky encoder flattens whatever comes out of 3 pools; z dim 512
    assert z.shape == (2, 512)
    dv = dec.init({"params": jax.random.key(1)}, z)
    y = dec.apply(dv, z, train=False)
    assert y.shape == x.shape
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0  # sigmoid


def test_lucky_bn_updates():
    enc = LuckyEncoder()
    x = jnp.ones((2, 16, 24, 16, 1))
    ev = enc.init({"params": jax.random.key(0)}, x)
    _, mut = enc.apply(ev, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(ev["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(np.asarray(o), np.asarray(n)) for o, n in zip(old, new))
