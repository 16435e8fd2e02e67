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
