"""Fused conv+BN-stat megakernel integration (blocks._conv_bn path).

The use_fused_stats flag must be a pure implementation detail: identical
param/batch_stats tree (checkpoints interchange), identical outputs,
running stats and gradients vs the stock Conv3d+BatchNorm path. Tiny
shapes, Pallas interpret mode on CPU (the kernel's TPU-vs-XLA numerics are
covered by tests/test_pallas_fused.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from sivae_tpu.config import ActivationConfig
from sivae_tpu.models.blocks import ConvBlock, UpBlock

ACT = ActivationConfig().with_no_dropout()


def _tree_paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _make_pair(cls, **kw):
    base = cls(out_ch=8, act=ACT, **kw)
    fused = cls(out_ch=8, act=ACT, use_fused_stats=True,
                fused_min_voxels=0, **kw)
    return base, fused


@pytest.mark.parametrize("cls,kw", [
    (ConvBlock, dict(stride=2)),
    (ConvBlock, dict(stride=1)),          # residual, 8->8 (no projection)
    (UpBlock, dict(stride=2)),            # fused-upconv second conv
    (UpBlock, dict(stride=2, fuse_upconv=False)),
    (UpBlock, dict(stride=1)),
])
def test_fused_matches_stock(cls, kw):
    base, fused = _make_pair(cls, **kw)
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 4, 8), jnp.float32)
    v = base.init(jax.random.key(1), x, train=False)
    v2 = fused.init(jax.random.key(1), x, train=False)
    assert _tree_paths(v) == _tree_paths(v2)

    y_ref, mut_ref = base.apply(v, x, train=True, mutable=["batch_stats"])
    y_fused, mut_fused = fused.apply(v, x, train=True,
                                     mutable=["batch_stats"])
    assert jnp.allclose(y_ref, y_fused, atol=1e-5), (
        float(jnp.abs(y_ref - y_fused).max()))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(mut_ref)[0],
            jax.tree_util.tree_flatten_with_path(mut_fused)[0]):
        assert p1 == p2
        assert jnp.allclose(a, b, atol=1e-5), jax.tree_util.keystr(p1)

    # eval mode goes through the stock modules either way
    e_ref = base.apply(v, x, train=False)
    e_fused = fused.apply(v, x, train=False)
    assert jnp.allclose(e_ref, e_fused, atol=1e-6)


def test_fused_gradients_match():
    base, fused = _make_pair(ConvBlock, stride=2)
    x = jax.random.normal(jax.random.key(2), (2, 4, 4, 4, 8), jnp.float32)
    v = base.init(jax.random.key(3), x, train=False)

    def loss(params, mod):
        y, _ = mod.apply({**v, "params": params}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss)(v["params"], base)
    g_fused = jax.grad(loss)(v["params"], fused)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_fused)[0]):
        assert p1 == p2
        scale = max(1.0, float(jnp.abs(a).max()))
        assert jnp.allclose(a, b, atol=2e-4 * scale), (
            jax.tree_util.keystr(p1), float(jnp.abs(a - b).max()))


def test_flag_plumbed_through_model():
    """cfg.use_fused_conv_bn reaches the blocks and keeps the tree."""
    from sivae_tpu.models.registry import get_model_config, make_model

    cfg = get_model_config("tiny_spatial")
    cfg_f = dataclasses.replace(cfg, use_fused_conv_bn=True)
    m = make_model(cfg)
    m2 = make_model(cfg_f)
    x = jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32)
    v = m.init(jax.random.key(0), x)
    v2 = m2.init(jax.random.key(0), x)
    assert _tree_paths(v) == _tree_paths(v2)
    # tiny shapes are below HI_RES_VOXELS: fused path must fall back
    # everywhere and produce identical numerics
    (mu, lv, z, xr), _ = m2.forward(v2, x, jax.random.key(1), train=True)
    (mu0, lv0, z0, xr0), _ = m.forward(v, x, jax.random.key(1), train=True)
    assert jnp.allclose(xr, xr0, atol=1e-6)
