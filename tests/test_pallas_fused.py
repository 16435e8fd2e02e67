"""Correctness of the fused [BN-apply+act] -> conv -> [BN-stat] Pallas
megakernel (kernels/conv3d_fused.py) vs the XLA reference ops, in
interpreter mode on CPU (real-TPU timing lives in tools/megakernel_ab.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivae_tpu.kernels.conv3d_fused import conv3d_fused_stats, conv3d_v2


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


@pytest.mark.parametrize("shape,co", [((2, 5, 8, 6, 4), 8),
                                      ((1, 4, 4, 4, 3), 5)])
def test_conv_v2_matches_xla(shape, co):
    kx, kw_ = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw_, (3, 3, 3, shape[-1], co), jnp.float32) * 0.2
    got = conv3d_v2(x, w, interpret=True)
    want = _xla_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stats_match_direct_reduction():
    kx, kw_ = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (2, 4, 8, 6, 4), jnp.float32)
    w = jax.random.normal(kw_, (3, 3, 3, 4, 8), jnp.float32) * 0.2
    y, psum, psumsq = conv3d_fused_stats(x, w, interpret=True)
    yf = np.asarray(y, np.float64)
    np.testing.assert_allclose(np.asarray(psum).sum(axis=(0, 1)),
                               yf.sum(axis=(0, 1, 2, 3)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(psumsq).sum(axis=(0, 1)),
                               (yf * yf).sum(axis=(0, 1, 2, 3)), rtol=1e-5)
    # batch mean/var assembled from the partials == direct computation
    n = yf.shape[0] * yf.shape[1] * yf.shape[2] * yf.shape[3]
    mean = np.asarray(psum).sum(axis=(0, 1)) / n
    var = np.asarray(psumsq).sum(axis=(0, 1)) / n - mean**2
    np.testing.assert_allclose(mean, yf.mean(axis=(0, 1, 2, 3)), atol=1e-6)
    np.testing.assert_allclose(var, yf.var(axis=(0, 1, 2, 3)),
                               rtol=1e-4, atol=1e-6)


def test_fused_input_affine_act():
    """g(x) = leaky_relu(x*a + b) fused on the input == applying it
    before an XLA conv."""
    kx, kw_, ka, kb = jax.random.split(jax.random.key(2), 4)
    x = jax.random.normal(kx, (1, 4, 6, 6, 5), jnp.float32)
    w = jax.random.normal(kw_, (3, 3, 3, 5, 4), jnp.float32) * 0.2
    a = jax.random.uniform(ka, (5,), jnp.float32, 0.5, 1.5)
    b = jax.random.normal(kb, (5,), jnp.float32) * 0.1
    y, _, _ = conv3d_fused_stats(x, w, in_a=a, in_b=b, slope=0.01,
                                 interpret=True)
    g = jax.nn.leaky_relu(x * a + b, negative_slope=0.01)
    want = _xla_conv(g, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv_v2_bf16_close_to_f32_reference():
    """bf16 inputs, f32 accumulation across all 27 taps: one rounding at
    the end, so the kernel tracks the f32 conv to bf16 resolution."""
    kx, kw_ = jax.random.split(jax.random.key(3))
    x32 = jax.random.normal(kx, (1, 4, 8, 8, 4), jnp.float32)
    w32 = jax.random.normal(kw_, (3, 3, 3, 4, 8), jnp.float32) * 0.2
    got = conv3d_v2(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
                    interpret=True)
    want = _xla_conv(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


def test_fused_stats_compiles_on_tpu():
    """interpret=False smoke test (ADVICE r4): the Mosaic lowering
    constraints this kernel works around (lane-split reshapes, offset-
    mismatched lane concats, the 16M scoped-vmem limit) are only reachable
    on real TPU; the rest of this module runs the interpreter. Skipped
    off-TPU (the suite pins JAX_PLATFORMS=cpu; run manually on hardware,
    or via tools/megakernel_ab.py --check which covers the real shape)."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    kx, kw_ = jax.random.split(jax.random.key(7))
    x = jax.random.normal(kx, (1, 4, 8, 8, 8), jnp.bfloat16)
    w = (jax.random.normal(kw_, (3, 3, 3, 8, 8), jnp.float32) * 0.2).astype(jnp.bfloat16)
    y, s1, s2 = jax.jit(lambda x, w: conv3d_fused_stats(x, w))(x, w)
    want = _xla_conv(x, w)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)
    assert np.isfinite(np.asarray(s1, np.float32)).all()
    assert np.isfinite(np.asarray(s2, np.float32)).all()


def test_multi_h_block_matches_whole_plane():
    """Forcing the VMEM-driven H-block split (h_block < H) must be
    invisible: same conv output and same accumulated stat partials as the
    single-block path (the flagship shape runs hb=H/2 on hardware)."""
    kx, kw_ = jax.random.split(jax.random.key(5))
    x = jax.random.normal(kx, (2, 4, 8, 6, 4), jnp.float32)
    w = jax.random.normal(kw_, (3, 3, 3, 4, 8), jnp.float32) * 0.2
    ka, kb = jax.random.split(jax.random.key(6))
    a = jax.random.uniform(ka, (4,), jnp.float32, 0.5, 1.5)
    b = jax.random.normal(kb, (4,), jnp.float32) * 0.1
    for kwargs in ({}, {"in_a": a, "in_b": b}):
        y1, s1a, s2a = conv3d_fused_stats(x, w, interpret=True, **kwargs)
        for hb in (2, 4):
            y2, s1b, s2b = conv3d_fused_stats(x, w, interpret=True,
                                              h_block=hb, **kwargs)
            np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(s1b), np.asarray(s1a),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(s2b), np.asarray(s2a),
                                       rtol=1e-5, atol=1e-5)


def test_conv3d_stats_vjp_matches_xla_autodiff():
    """Gradients of a scalar built from ALL THREE outputs (y, s1, s2) match
    XLA autodiff of the same function — the integration form where BN
    consumes the fused stat partials."""
    from sivae_tpu.kernels.conv3d_fused import conv3d_stats

    kx, kw_ = jax.random.split(jax.random.key(4))
    x = jax.random.normal(kx, (1, 4, 6, 6, 4), jnp.float32)
    w = jax.random.normal(kw_, (3, 3, 3, 4, 6), jnp.float32) * 0.2

    def loss_pallas(x, w):
        y, s1, s2 = conv3d_stats(x, w, True)
        return (jnp.sum(y * y) * 0.5 + jnp.sum(jnp.sin(s1))
                + jnp.sum(jnp.sqrt(s2 + 1.0)))

    def loss_xla(x, w):
        y = _xla_conv(x, w)
        s1 = jnp.sum(y, axis=(2, 3))
        s2 = jnp.sum(y * y, axis=(2, 3))
        return (jnp.sum(y * y) * 0.5 + jnp.sum(jnp.sin(s1))
                + jnp.sum(jnp.sqrt(s2 + 1.0)))

    np.testing.assert_allclose(loss_pallas(x, w), loss_xla(x, w), rtol=1e-5)
    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-4)
