"""2D mesh (data x spatial) tests: the full train step over volumes sharded
in BOTH batch and depth must match the single-device result — XLA GSPMD
inserts the conv halo exchanges (SURVEY §5: the CP-equivalent axis that lets
"fullsize" volumes exceed one chip's memory)."""

import jax
import numpy as np

from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
from sivae_tpu.models.registry import get_model_config, make_model
from sivae_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch, volume_sharding
from sivae_tpu.train.state import create_train_state
from sivae_tpu.train.step import make_soft_intro_train_step

CFG = get_model_config("tiny_spatial")  # input 16^3, strides 2,2 -> latent 4^3
LOSS = SoftIntroLossConfig(scale=8.0 / (16 * 16 * 16))
OPT = OptimConfig()


def test_data_x_spatial_mesh_matches_single_device():
    model = make_model(CFG)
    x = jax.random.uniform(jax.random.key(0), (8,) + CFG.input_shape + (1,))
    state = create_train_state(model, jax.random.key(1), x[:1], OPT, 10)
    step = jax.jit(make_soft_intro_train_step(model, LOSS, OPT, 10, CFG.input_shape))
    ref_state, ref_metrics = step(state, x)

    mesh = make_mesh((2, 4), ("data", "spatial"))
    dp_state = replicate_state(state, mesh)
    xs = shard_batch(np.asarray(x), mesh, spatial_axis="spatial")
    assert xs.sharding.spec == ("data", "spatial")
    new_state, metrics = step(dp_state, xs)

    np.testing.assert_allclose(float(ref_metrics["lossE"]), float(metrics["lossE"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(ref_metrics["lossD"]), float(metrics["lossD"]),
                               rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.dec_params),
                    jax.tree_util.tree_leaves(new_state.dec_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_spatial_only_forward_matches():
    """Pure spatial sharding (8-way depth) of an eval forward."""
    model = make_model(CFG)
    x = jax.random.uniform(jax.random.key(2), (2,) + CFG.input_shape + (1,))
    variables = model.init(jax.random.key(3), x[:1])

    @jax.jit
    def enc(v, x):
        (mu, logvar), _ = model.encode(v, x)
        return mu

    ref = np.asarray(enc(variables["enc"], x))
    mesh = make_mesh((1, 8), ("data", "spatial"))
    xs = jax.device_put(np.asarray(x), volume_sharding(mesh))
    vrep = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), variables["enc"])
    got = np.asarray(enc(vrep, xs))
    np.testing.assert_allclose(ref, got, atol=1e-5)


def test_fullsize_config_on_data_x_spatial_mesh():
    """The fullsize (~5M voxel) flagship topology (registry
    'spatial_1200_fullsize': 160x192x160 input, 4 stride-2 stages -> latent
    (10,12,10) = 1200-d) trains one step on the 2x4 data x spatial mesh.
    Channels are scaled down for CPU speed; the input resolution and stage
    topology are the real ones (reference README.md:20-21, dataset.py:34-37)."""
    import dataclasses

    full = get_model_config("spatial_1200_fullsize")
    assert full.input_shape == (160, 192, 160)
    assert full.latent_dim == 1200  # same latent as the half-size flagship
    cfg = dataclasses.replace(
        full, in_ch=2,
        block_setting=tuple((2, 1, 2) for _ in full.block_setting))
    assert cfg.latent_spatial_shape == full.latent_spatial_shape
    model = make_model(cfg)
    loss = SoftIntroLossConfig(scale=8.0 / np.prod(cfg.input_shape))

    mesh = make_mesh((2, 4), ("data", "spatial"))
    x = np.random.RandomState(0).rand(2, *cfg.input_shape, 1).astype(np.float32)
    state = create_train_state(
        model, jax.random.key(1),
        jax.numpy.zeros((1,) + cfg.input_shape + (1,), jax.numpy.float32),
        OPT, 10)
    state = replicate_state(state, mesh)
    xs = shard_batch(x, mesh, spatial_axis="spatial")
    assert xs.sharding.spec == ("data", "spatial")
    step = jax.jit(make_soft_intro_train_step(model, loss, OPT, 10, cfg.input_shape),
                   donate_argnums=(0,))
    new_state, metrics = step(state, xs)
    assert np.isfinite(float(metrics["lossE"]))
    assert np.isfinite(float(metrics["lossD"]))
    assert int(jax.device_get(new_state.step)) == 1
