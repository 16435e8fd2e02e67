"""Spatial-latent ResNet VAE / CAE / Soft-IntroVAE family (flax.linen, NDHWC).

Re-design of reference models/models.py (ResNetEncoder :83-108,
ResNetDecoder :110-145, VAEResNetEncoder :213-223, SoftIntroVAE :257-300),
models/vaemodel.py and models/models-conv-b-ReLU.py — all expressed by one
`SpatialVAEConfig` (activation/dropout scheme selects the variant).

The latent is a 1-channel spatial map: NDHWC shape (B, d, h, w, 1) where
(d, h, w) = input_shape / prod(strides). E.g. (10, 12, 10) -> 1200-d for the
flagship config (reference z-1200main.py:158).

Encoder and decoder are separate linen modules because Soft-IntroVAE trains
them with two optimizers in alternating phases; the functional `SoftIntroVAE`
wrapper bundles them with explicit state threading (params / batch_stats /
PRNG keys are all explicit — no hidden module state).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sivae_tpu.config import SpatialVAEConfig
from sivae_tpu.models.blocks import (
    Conv3d,
    ConvBlock,
    ConvBNAct,
    UpBlock,
    make_act,
    maybe_remat,
    resolve_small_ch,
)

Array = jnp.ndarray
Variables = Dict[str, Any]


class SpatialEncoder(nn.Module):
    """Stem + ConvBlock stack + 1x1 head(s).

    variational=True adds parallel `mu`/`logvar` 1x1-conv heads (reference
    models/models.py:213-223); False gives the CAE single head (:105).
    """

    cfg: SpatialVAEConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        cfg = self.cfg
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        bkw = dict(use_pallas=cfg.use_pallas_conv, **kw)
        Stem = maybe_remat(ConvBNAct, cfg.remat, cfg.remat_policy)
        Block = maybe_remat(ConvBlock, cfg.remat, cfg.remat_policy)
        h = Stem(cfg.in_ch, act=cfg.act, dropout=cfg.act.stem_dropout,
                 use_pallas_small=resolve_small_ch(cfg.use_pallas_small_ch),
                 **bkw)(x, train)
        for c, n, s in cfg.block_setting:
            for i in range(n):
                stride = s if i == 0 else 1
                h = Block(c, stride, act=cfg.act, **bkw)(h, train)
        if cfg.variational:
            mu = Conv3d(1, kernel_size=(1, 1, 1), use_bias=True, name="mu", **kw)(h)
            logvar = Conv3d(1, kernel_size=(1, 1, 1), use_bias=True, name="logvar",
                            zero_init=cfg.logvar_head_zero_init, **kw)(h)
            if cfg.logvar_clip is not None:
                logvar = jnp.clip(logvar, cfg.logvar_clip[0], cfg.logvar_clip[1])
            return mu, logvar
        return Conv3d(1, kernel_size=(1, 1, 1), use_bias=True, name="head", **kw)(h)


class SpatialDecoder(nn.Module):
    """Mirror of the encoder: 1x1 expand + UpBlock walk + output conv.

    The channel schedule walks `block_setting` in reverse, switching to the
    next line's channel count (or the stem width at the end) on the last
    block of each line — parity with reference models/models.py:110-145.
    """

    cfg: SpatialVAEConfig

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        cfg = self.cfg
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        bkw = dict(use_pallas=cfg.use_pallas_conv, tag_scope="dec", **kw)
        Head = maybe_remat(ConvBNAct, cfg.remat, cfg.remat_policy)
        Block = maybe_remat(UpBlock, cfg.remat, cfg.remat_policy)
        last = cfg.block_setting[-1][0]
        h = Head(
            last, act=cfg.act, dropout=cfg.act.dec_in_dropout,
            kernel_size=(1, 1, 1), **bkw,
        )(z, train)
        rev = cfg.block_setting[::-1]
        n_lines = len(rev)
        for i in range(n_lines):
            c, n, s = rev[i]
            nc = cfg.in_ch if i == n_lines - 1 else rev[i + 1][0]
            for j in range(n):
                stride = s if j == n - 1 else 1
                out_c = nc if j == n - 1 else c
                h = Block(out_c, stride, act=cfg.act,
                          fuse_upconv=cfg.fuse_upconv,
                          **bkw)(h, train)
        h = Conv3d(1, use_bias=True, use_pallas=cfg.use_pallas_conv,
                   use_pallas_small=resolve_small_ch(cfg.use_pallas_small_ch),
                   tag_scope="dec", **kw)(h)
        h = make_act(cfg.act, which="tail")(h)
        if cfg.act.dec_out_dropout > 0.0:
            h = nn.Dropout(rate=cfg.act.dec_out_dropout, deterministic=not train)(h)
        return h


def reparameterize(rng: jax.Array, mu: Array, logvar: Array,
                   val_eps: Optional[float] = None) -> Array:
    """z = mu + eps * std. Training draws eps ~ N(0, I); validation uses the
    reference's fixed eps (models/models.py:263-271, default 0.1)."""
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    if val_eps is not None:
        return mu.astype(jnp.float32) + val_eps * std
    eps = jax.random.normal(rng, std.shape, dtype=jnp.float32)
    return mu.astype(jnp.float32) + eps * std


@dataclass(frozen=True)
class SoftIntroVAE:
    """Functional bundle of (encoder, decoder) with explicit state.

    Variables layout:
      {"enc": {"params": ..., "batch_stats": ...},
       "dec": {"params": ..., "batch_stats": ...}}

    Every method takes/returns state explicitly; batch_stats updates are
    returned so the jitted train step can thread them through the multiple
    forward passes in reference order.
    """

    encoder: nn.Module
    decoder: nn.Module
    latent_shape: Tuple[int, ...]
    latent_dim: int
    variational: bool = True

    # -- init ---------------------------------------------------------------
    def init(self, rng: jax.Array, sample_x: Array) -> Variables:
        enc_rng, dec_rng, drop_rng = jax.random.split(rng, 3)
        enc_vars = self.encoder.init({"params": enc_rng, "dropout": drop_rng},
                                     sample_x, train=False)
        z = jnp.zeros((sample_x.shape[0],) + self.latent_shape, sample_x.dtype)
        dec_vars = self.decoder.init({"params": dec_rng, "dropout": drop_rng},
                                     z, train=False)
        return {"enc": dict(enc_vars), "dec": dict(dec_vars)}

    # -- raw applies (return updated batch_stats when train=True) -----------
    def encode(self, enc_vars: Variables, x: Array, *, train: bool = False,
               dropout_rng: Optional[jax.Array] = None):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        if train:
            out, mut = self.encoder.apply(enc_vars, x, train=True, rngs=rngs,
                                          mutable=["batch_stats"])
            new_vars = {**enc_vars, "batch_stats": mut["batch_stats"]}
            return out, new_vars
        out = self.encoder.apply(enc_vars, x, train=False)
        return out, enc_vars

    def decode(self, dec_vars: Variables, z: Array, *, train: bool = False,
               dropout_rng: Optional[jax.Array] = None):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        z = z.reshape((z.shape[0],) + self.latent_shape)
        if train:
            y, mut = self.decoder.apply(dec_vars, z, train=True, rngs=rngs,
                                        mutable=["batch_stats"])
            new_vars = {**dec_vars, "batch_stats": mut["batch_stats"]}
            return y, new_vars
        y = self.decoder.apply(dec_vars, z, train=False)
        return y, dec_vars

    # -- convenience forward (reference SoftIntroVAE.forward :273-277) ------
    def forward(self, variables: Variables, x: Array, rng: jax.Array,
                *, train: bool = False, val_eps: Optional[float] = None):
        """Returns (mu, logvar, z, x_rec), new_variables."""
        rng_rep, rng_de, rng_dd = jax.random.split(rng, 3)
        (mu, logvar), enc_vars = self.encode(
            variables["enc"], x, train=train, dropout_rng=rng_de)
        z = reparameterize(rng_rep, mu, logvar, val_eps=val_eps)
        x_rec, dec_vars = self.decode(
            variables["dec"], z, train=train, dropout_rng=rng_dd)
        return (mu, logvar, z, x_rec), {"enc": enc_vars, "dec": dec_vars}

    def sample_with_noise(self, variables: Variables, rng: jax.Array,
                          num_samples: int = 1) -> Array:
        """Decode N(0, I) noise (reference models/models.py:298-300)."""
        z = jax.random.normal(rng, (num_samples,) + self.latent_shape)
        y, _ = self.decode(variables["dec"], z, train=False)
        return y

    def sample(self, variables: Variables, z: Array) -> Array:
        """Decode given flat latents (reference models/models.py:292-296)."""
        z = z.reshape((-1,) + self.latent_shape)
        y, _ = self.decode(variables["dec"], z, train=False)
        return y


def make_spatial_soft_intro_vae(cfg: SpatialVAEConfig) -> SoftIntroVAE:
    return SoftIntroVAE(
        encoder=SpatialEncoder(cfg),
        decoder=SpatialDecoder(cfg),
        latent_shape=cfg.latent_shape,
        latent_dim=cfg.latent_dim,
        variational=cfg.variational,
    )
