"""3D CNN classifier: encoder backbone + dense head.

The reference trains arbitrary CNNs with CrossEntropy through its generic
`train` loop (utils/my_trainer.py:829-910) and evaluates with a confusion
matrix (utils/confusion.py). Here the classifier reuses the spatial ResNet
encoder trunk (blocks without the VAE heads) + GAP + Dense.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sivae_tpu.config import SpatialVAEConfig
from sivae_tpu.models.blocks import ConvBlock, ConvBNAct, maybe_remat

Array = jnp.ndarray


class ResNetClassifier(nn.Module):
    cfg: SpatialVAEConfig
    num_classes: int = 2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.cfg
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        Stem = maybe_remat(ConvBNAct, cfg.remat)
        Block = maybe_remat(ConvBlock, cfg.remat)
        h = Stem(cfg.in_ch, act=cfg.act, dropout=cfg.act.stem_dropout, **kw)(x, train)
        for c, n, s in cfg.block_setting:
            for i in range(n):
                stride = s if i == 0 else 1
                h = Block(c, stride, act=cfg.act, **kw)(h, train)
        h = jnp.mean(h, axis=(1, 2, 3))  # global average pool
        return nn.Dense(self.num_classes, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype)(h).astype(jnp.float32)
