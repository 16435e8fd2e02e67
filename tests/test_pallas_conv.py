"""Correctness tests for the Pallas 3x3x3 conv kernel (interpret mode on
CPU) against lax.conv_general_dilated, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivae_tpu.kernels.conv3d import conv3d_same_pallas


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 4, 5, 6), 3, 4),
    ((1, 6, 8, 6), 8, 8),
    ((2, 3, 4, 4), 1, 5),
])
def test_forward_matches_lax(shape, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.1)
    got = conv3d_same_pallas(x, w, True)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_grad_matches_lax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 5, 4, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 4).astype(np.float32) * 0.1)

    def loss_pallas(x, w):
        return jnp.sum(conv3d_same_pallas(x, w, True) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_ref_conv(x, w) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3)


def test_bf16_forward():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 4).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    got = np.asarray(conv3d_same_pallas(x, w, True).astype(jnp.float32))
    want = np.asarray(_ref_conv(x, w).astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
