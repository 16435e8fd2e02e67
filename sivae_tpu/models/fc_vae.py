"""FC-latent ("vector z") Soft-IntroVAE family (flax.linen, NDHWC).

Re-design of reference models/mymodel.py: a hand-rolled 4-stage encoder
(AvgPool x4: 80x96x80 -> 5x6x5) with two explicit skip connections, a
Dense(forth_ch*150 -> 2*z_ch) head split into (mu, logvar)
(mymodel.py:51-143), and the mirrored decoder with Dense(z_ch ->
forth_ch*150) + conv/upsample stages with skips (mymodel.py:146-230).
z_ch in {150, 300, 600} (reference 600z_main.py:176).

Note on flatten order: the torch code flattens (C, D, H, W) C-order into the
Dense; we flatten (D, H, W, C). The Dense layer is learned, so the feature
permutation is immaterial — only the latent dimensionality and the spatial
topology of the conv stack define the architecture.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from sivae_tpu.config import FCVAEConfig
from sivae_tpu.models.blocks import (
    BatchNorm,
    Conv3d,
    ConvBNAct,
    avg_pool3d,
    make_act,
    maybe_remat,
    upsample_nearest3d,
)
from sivae_tpu.models.resnet_vae import SoftIntroVAE

Array = jnp.ndarray


class FCEncoder(nn.Module):
    """Reference models/mymodel.py:51-143 (`ResNetVAEencoder`)."""

    cfg: FCVAEConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        cfg = self.cfg
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        act = make_act(cfg.act)
        f, s, t, fo = cfg.first_ch, cfg.second_ch, cfg.third_ch, cfg.forth_ch
        CBA = maybe_remat(ConvBNAct, cfg.remat, cfg.remat_policy)

        def cba(h, ch):
            return CBA(ch, act=cfg.act, dropout=0.0,
                       use_pallas=cfg.use_pallas_conv, **kw)(h, train)

        # block1 + pool1
        h = cba(cba(x, f), f)
        h = avg_pool3d(h, 2)
        # block2 + pool2 (channel up f -> s)
        h = cba(cba(h, f), s)
        h = avg_pool3d(h, 2)
        # block3 + pool3 (channel up s -> t)
        h = cba(cba(h, s), t)
        h = avg_pool3d(h, 2)
        # block4short
        h = cba(h, t)
        # block5 with skip: x = act(x + block5(x))  (mymodel.py:135-136)
        h = act(h + cba(h, t))
        # block6: conv -> pool -> channel up t -> fo  (mymodel.py:91-99)
        h = cba(h, t)
        h = avg_pool3d(h, 2)
        h = cba(h, fo)
        # block7 with skip: conv -> act -> conv -> BN (no act), then add+act
        g = cba(h, fo)
        g = Conv3d(fo, use_bias=True, **kw)(g)
        g = BatchNorm(**kw)(g, train)
        h = act(h + g)
        # fc head -> (mu, logvar). The reference uses one Linear chunked in
        # two (mymodel.py:125,142); two Denses are equivalent and let the
        # logvar half zero-init for early-training stability.
        h = h.reshape((h.shape[0], -1))
        mu = nn.Dense(cfg.z_ch, name="mu",
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h)
        logvar = nn.Dense(
            cfg.z_ch, name="logvar",
            kernel_init=(nn.initializers.zeros if cfg.logvar_head_zero_init
                         else nn.linear.default_kernel_init),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h)
        if cfg.logvar_clip is not None:
            logvar = jnp.clip(logvar, cfg.logvar_clip[0], cfg.logvar_clip[1])
        return mu, logvar


class FCDecoder(nn.Module):
    """Reference models/mymodel.py:146-230 (`ResNetDecoder`)."""

    cfg: FCVAEConfig

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        cfg = self.cfg
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        act = make_act(cfg.act)
        f, s, t, fo = cfg.first_ch, cfg.second_ch, cfg.third_ch, cfg.forth_ch
        d, h_, w = cfg.bottleneck_spatial_shape
        CBA = maybe_remat(ConvBNAct, cfg.remat, cfg.remat_policy)

        def cba(x, ch):
            return CBA(ch, act=cfg.act, dropout=0.0,
                       use_pallas=cfg.use_pallas_conv, tag_scope="dec",
                       **kw)(x, train)

        def up_cba(x, ch):
            """fused nearest-up(2) + conv -> BN -> act (exact)."""
            return CBA(ch, act=cfg.act, dropout=0.0,
                       upsample2_fused=True, tag_scope="dec", **kw)(x, train)

        def conv_bn(x, ch):
            x = Conv3d(ch, use_bias=True, tag_scope="dec", **kw)(x)
            return BatchNorm(**kw)(x, train)

        y = z.reshape((z.shape[0], -1))
        y = nn.Dense(fo * d * h_ * w, dtype=cfg.dtype, param_dtype=cfg.param_dtype)(y)
        y = nn.relu(y)  # dfc tail is ReLU (mymodel.py:150-153)
        y = y.reshape((y.shape[0], d, h_, w, fo))
        # block1 skip: conv-BN-act-conv-BN, add, act (mymodel.py:221-222)
        g = conv_bn(cba(y, fo), fo)
        y = act(y + g)
        # block2u: conv-BN-act -> up2 -> conv-BN-act (fo -> t)
        y = cba(y, fo)
        y = up_cba(y, t) if cfg.fuse_upconv else cba(upsample_nearest3d(y, 2), t)
        # block3 skip
        g = conv_bn(cba(y, t), t)
        y = act(y + g)
        # block4u (t -> s), block5u (s -> f), block6u (f -> f)
        for ch_in, ch_out in ((t, s), (s, f), (f, f)):
            y = cba(y, ch_in)
            y = (up_cba(y, ch_out) if cfg.fuse_upconv
                 else cba(upsample_nearest3d(y, 2), ch_out))
        # last block: conv -> ReLU (mymodel.py:210-213)
        y = Conv3d(1, use_bias=True, tag_scope="dec", **kw)(y)
        return nn.relu(y)


def make_fc_soft_intro_vae(cfg: FCVAEConfig) -> SoftIntroVAE:
    return SoftIntroVAE(
        encoder=FCEncoder(cfg),
        decoder=FCDecoder(cfg),
        latent_shape=cfg.latent_shape,
        latent_dim=cfg.latent_dim,
        variational=True,
    )
