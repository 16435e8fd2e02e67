"""Equivalence tests: fused upsample+conv == upsample then conv, at the op
level, block level (same param tree!), and through gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sivae_tpu.config import ActivationConfig
from sivae_tpu.models.blocks import UpBlock, upsample_nearest3d
from sivae_tpu.models.registry import get_model_config, make_model
from sivae_tpu.ops.fused_upconv import upsampled_conv3x3


def _direct(x, w, bias=None):
    u = upsample_nearest3d(x, 2)
    y = jax.lax.conv_general_dilated(
        u, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def test_op_equivalence():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 5, 3, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 6, 7).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(7).astype(np.float32))
    got = upsampled_conv3x3(x, w, b)
    want = _direct(x, w, b)
    assert got.shape == (2, 8, 10, 6, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_op_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 3, 4, 3, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 2).astype(np.float32) * 0.1)
    g_f = jax.grad(lambda x, w: jnp.sum(upsampled_conv3x3(x, w) ** 2), (0, 1))(x, w)
    g_d = jax.grad(lambda x, w: jnp.sum(_direct(x, w) ** 2), (0, 1))(x, w)
    for a, b in zip(g_f, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_upblock_param_tree_and_output_equivalence():
    """Fused and unfused UpBlocks must have IDENTICAL param trees and equal
    outputs for the same params."""
    act = ActivationConfig().with_no_dropout()
    fused = UpBlock(out_ch=5, stride=2, act=act, fuse_upconv=True)
    plain = UpBlock(out_ch=5, stride=2, act=act, fuse_upconv=False)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 4, 4, 3).astype(np.float32))
    v_f = fused.init({"params": jax.random.key(0)}, x, False)
    v_p = plain.init({"params": jax.random.key(0)}, x, False)
    tf = jax.tree_util.tree_structure(v_f)
    tp = jax.tree_util.tree_structure(v_p)
    assert tf == tp, f"param trees differ:\n{tf}\nvs\n{tp}"
    out_f = fused.apply(v_p, x, False)
    out_p = plain.apply(v_p, x, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-4, rtol=1e-4)


def test_model_level_equivalence():
    cfg = get_model_config("tiny_spatial")
    cfg_f = dataclasses.replace(cfg, fuse_upconv=True)
    cfg_p = dataclasses.replace(cfg, fuse_upconv=False)
    m_f, m_p = make_model(cfg_f), make_model(cfg_p)
    x = jnp.asarray(np.random.RandomState(3).rand(2, *cfg.input_shape, 1).astype(np.float32))
    v = m_p.init(jax.random.key(0), x)
    (mu, lv, z, rec_p), _ = m_p.forward(v, x, jax.random.key(1), val_eps=0.1)
    (mu2, lv2, z2, rec_f), _ = m_f.forward(v, x, jax.random.key(1), val_eps=0.1)
    np.testing.assert_allclose(np.asarray(rec_f), np.asarray(rec_p),
                               atol=1e-4, rtol=1e-4)


def test_fc_model_level_equivalence():
    cfg = get_model_config("tiny_fc")
    cfg_f = dataclasses.replace(cfg, fuse_upconv=True)
    cfg_p = dataclasses.replace(cfg, fuse_upconv=False)
    m_f, m_p = make_model(cfg_f), make_model(cfg_p)
    x = jnp.asarray(np.random.RandomState(4).rand(2, *cfg.input_shape, 1).astype(np.float32))
    v = m_p.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(m_f.init(jax.random.key(0), x))
            == jax.tree_util.tree_structure(v))
    (_, _, _, rec_p), _ = m_p.forward(v, x, jax.random.key(1), val_eps=0.1)
    (_, _, _, rec_f), _ = m_f.forward(v, x, jax.random.key(1), val_eps=0.1)
    np.testing.assert_allclose(np.asarray(rec_f), np.asarray(rec_p),
                               atol=1e-4, rtol=1e-4)
