""""Lucky" autoencoder: the hand-written conv+pool FC-512 AE variant.

Port of reference models/model.py Encoder_lucky/Decoder_lucky (:148-223):
encoder = 4 convs with MaxPool x3 down to (10,12,10,64) then FC->512 ReLU
bottleneck (the declared conv5 is never used in the reference forward);
decoder = FC + BN1d + three nearest upsamples with 3x3x3 convs and a
sigmoid output.

Note: stride-1 SAME ConvTranspose3d(k=3, padding=1) is mathematically a
stride-1 SAME Conv3d with a flipped kernel — represented as Conv3d here.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


def _max_pool3d(x: Array, s: int = 2) -> Array:
    return nn.max_pool(x, window_shape=(s, s, s), strides=(s, s, s))


def _upsample_to(x: Array, shape: Tuple[int, int, int]) -> Array:
    """Nearest-neighbour resize to an explicit (D, H, W)."""
    b, d, h, w, c = x.shape
    out = jnp.repeat(x, shape[0] // d, axis=1)
    out = jnp.repeat(out, shape[1] // h, axis=2)
    out = jnp.repeat(out, shape[2] // w, axis=3)
    return out


class LuckyEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        def conv(h, ch, k=3, strides=1):
            return nn.Conv(ch, (k, k, k), strides=(strides,) * 3, padding="SAME",
                           dtype=self.dtype)(h)

        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype)(h)

        x = nn.relu(bn(conv(x, 3)))
        x = _max_pool3d(x)
        x = nn.relu(bn(conv(x, 3)))
        x = _max_pool3d(x)
        x = nn.relu(bn(conv(x, 32)))
        x = nn.relu(bn(conv(x, 64)))
        x = _max_pool3d(x)
        x = x.reshape((x.shape[0], -1))
        return nn.relu(nn.Dense(512, dtype=self.dtype)(x))


class LuckyDecoder(nn.Module):
    bottleneck: Tuple[int, int, int] = (10, 12, 10)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        d, h, w = self.bottleneck

        def conv(x, ch):
            return nn.Conv(ch, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)

        def bn(x):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype)(x)

        y = nn.Dense(d * h * w * 64, dtype=self.dtype)(z)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype)(y))
        y = y.reshape((y.shape[0], d, h, w, 64))
        y = _upsample_to(y, (2 * d, 2 * h, 2 * w))
        y = nn.relu(bn(conv(y, 32)))
        y = nn.relu(bn(conv(y, 3)))
        y = _upsample_to(y, (4 * d, 4 * h, 4 * w))
        y = nn.relu(bn(conv(y, 3)))
        y = _upsample_to(y, (8 * d, 8 * h, 8 * w))
        return nn.sigmoid(conv(y, 1))
