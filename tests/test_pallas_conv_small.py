"""Correctness tests for the small-channel Pallas conv kernels
(sivae_tpu/kernels/conv3d_small.py) in interpret mode on CPU, against
lax.conv_general_dilated — forward and both gradients, both directions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivae_tpu.kernels.conv3d_small import conv3d_from1, conv3d_to1, fits_vmem


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


@pytest.mark.parametrize("shape,c", [
    ((2, 4, 5, 6), 3),
    ((1, 6, 8, 6), 8),
    ((2, 3, 4, 4), 1),
])
def test_to1_forward_matches_lax(shape, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape, c).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, c, 1).astype(np.float32) * 0.1)
    got = conv3d_to1(x, w, True)
    want = _ref_conv(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("shape,c", [
    ((2, 4, 5, 6), 3),
    ((1, 6, 8, 6), 8),
])
def test_from1_forward_matches_lax(shape, c):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 1, c).astype(np.float32) * 0.1)
    got = conv3d_from1(x, w, True)
    want = _ref_conv(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("fn,cin,cout", [
    (conv3d_to1, 3, 1),
    (conv3d_from1, 1, 3),
])
def test_grads_match_lax(fn, cin, cout):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 5, 4, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.1)

    def loss_pallas(x, w):
        return jnp.sum(fn(x, w, True) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_ref_conv(x, w) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3)


def test_bf16_to1_forward():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 6, 4, 8).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 1).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    got = np.asarray(conv3d_to1(x, w, True).astype(jnp.float32))
    want = np.asarray(_ref_conv(x, w).astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_fits_vmem_flagship_but_not_fullsize():
    assert fits_vmem(96, 80, 64)          # flagship half-size plane
    assert not fits_vmem(192, 160, 64)    # fullsize plane must fall back
