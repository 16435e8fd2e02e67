"""Shape / structure tests for the model families (SURVEY §7: "mirrored
decoder construction ... needs exhaustive shape tests for every config").

Real configs are instantiated on scaled-down input volumes so the CPU tests
stay fast while exercising the exact channel walks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivae_tpu.config import SpatialVAEConfig
from sivae_tpu.models.registry import MODEL_REGISTRY, get_model_config, make_model
from sivae_tpu.models.resnet_vae import reparameterize


def _shrunk(cfg):
    """Scale the input volume down (keeping divisibility) for CPU speed."""
    if isinstance(cfg, SpatialVAEConfig):
        total = 1
        for _, _, s in cfg.block_setting:
            total *= s
        shape = tuple(max(total, 2 * total) for _ in range(3))
        return dataclasses.replace(cfg, input_shape=(2 * total, 2 * total, 2 * total))
    return dataclasses.replace(cfg, input_shape=(16, 16, 16))


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shapes(name):
    cfg = _shrunk(get_model_config(name))
    if isinstance(cfg, SpatialVAEConfig) and not cfg.variational:
        pytest.skip("CAE covered separately")
    model = make_model(cfg)
    x = jnp.zeros((2,) + cfg.input_shape + (1,), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    (mu, logvar, z, x_rec), _ = model.forward(variables, x, jax.random.key(1), train=False)
    assert x_rec.shape == x.shape, f"{name}: decoder must mirror encoder"
    flat = int(np.prod(mu.shape[1:]))
    assert flat == cfg.latent_dim
    assert z.shape == mu.shape


def test_latent_dims_match_reference_matrix():
    # SURVEY §2.2: spatial_150 -> (5,6,5)=150, spatial_1200 -> (10,12,10)=1200
    assert get_model_config("spatial_150").latent_spatial_shape == (5, 6, 5)
    assert get_model_config("spatial_150").latent_dim == 150
    assert get_model_config("spatial_1200").latent_spatial_shape == (10, 12, 10)
    assert get_model_config("spatial_1200").latent_dim == 1200
    assert get_model_config("fc_600").latent_dim == 600


def test_cae_roundtrip_shape():
    cfg = _shrunk(get_model_config("cae_150"))
    from sivae_tpu.models.resnet_vae import SpatialDecoder, SpatialEncoder

    enc, dec = SpatialEncoder(cfg), SpatialDecoder(cfg)
    x = jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32)
    ev = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    z = enc.apply(ev, x, train=False)
    assert z.shape == (1,) + cfg.latent_shape
    dv = dec.init({"params": jax.random.key(2), "dropout": jax.random.key(3)}, z)
    y = dec.apply(dv, z, train=False)
    assert y.shape == x.shape


def test_reparameterize_train_vs_val():
    mu = jnp.ones((4, 8)) * 2.0
    logvar = jnp.zeros((4, 8))
    z_val = reparameterize(jax.random.key(0), mu, logvar, val_eps=0.1)
    # fixed eps: z = mu + 0.1 * std = 2.1 (reference models/models.py:263-271)
    np.testing.assert_allclose(np.asarray(z_val), 2.1, rtol=1e-6)
    z1 = reparameterize(jax.random.key(1), mu, logvar)
    z2 = reparameterize(jax.random.key(2), mu, logvar)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_reparameterize_statistics():
    # z ~ N(mu, std^2) with std = exp(0.5*logvar)
    mu = jnp.full((200_000,), 1.5)
    logvar = jnp.full((200_000,), np.log(0.25))  # std = 0.5
    z = np.asarray(reparameterize(jax.random.key(0), mu, logvar))
    assert abs(z.mean() - 1.5) < 5e-3
    assert abs(z.std() - 0.5) < 5e-3


def test_dropout_and_bn_update_only_in_train_mode():
    cfg = _shrunk(get_model_config("tiny_spatial"))
    model = make_model(cfg)
    x = jnp.ones((2,) + cfg.input_shape + (1,), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    # eval: deterministic, no state change
    (out_a, _), ev_a = model.encode(variables["enc"], x, train=False)
    (out_b, _), _ = model.encode(variables["enc"], x, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
    # train: batch_stats must change
    (_, _), new_enc = model.encode(
        variables["enc"], x, train=True, dropout_rng=jax.random.key(1))
    old = jax.tree_util.tree_leaves(variables["enc"]["batch_stats"])
    new = jax.tree_util.tree_leaves(new_enc["batch_stats"])
    assert any(not np.allclose(np.asarray(o), np.asarray(n)) for o, n in zip(old, new))


def test_sample_with_noise():
    cfg = _shrunk(get_model_config("tiny_fc"))
    model = make_model(cfg)
    x = jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    y = model.sample_with_noise(variables, jax.random.key(1), num_samples=3)
    assert y.shape == (3,) + cfg.input_shape + (1,)
    assert np.all(np.asarray(y) >= 0.0)  # decoder tail is ReLU


def test_custom_batchnorm_bit_identical_to_flax():
    """blocks.BatchNorm reimplements flax nn.BatchNorm to tag batch stats
    for the remat save set; it must stay BIT-identical (values, grads,
    running-stat updates, param tree) to the flax module it replaced."""
    import flax.linen as nn

    from sivae_tpu.models.blocks import BatchNorm

    class Ref(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x, train):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32)(x)

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 5, 4, 3), dtype)
        ours, ref = BatchNorm(dtype=dtype), Ref(dtype=dtype)
        vo = ours.init(jax.random.key(0), x, True)
        vr = ref.init(jax.random.key(0), x, True)
        assert (jax.tree_util.tree_structure(vo)
                == jax.tree_util.tree_structure(vr))
        yo, mo = ours.apply(vo, x, True, mutable=["batch_stats"])
        yr, mr = ref.apply(vr, x, True, mutable=["batch_stats"])
        assert jnp.array_equal(yo, yr)
        for a, b in zip(jax.tree_util.tree_leaves(mo),
                        jax.tree_util.tree_leaves(mr)):
            assert jnp.array_equal(a, b)
        assert jnp.array_equal(ours.apply(vo, x, False), ref.apply(vr, x, False))
        g1 = jax.grad(lambda v: jnp.sum(ours.apply(
            v, x, True, mutable=["batch_stats"])[0].astype(jnp.float32) ** 2))(vo)
        g2 = jax.grad(lambda v: jnp.sum(ref.apply(
            v, x, True, mutable=["batch_stats"])[0].astype(jnp.float32) ** 2))(vr)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            assert jnp.array_equal(a, b)
