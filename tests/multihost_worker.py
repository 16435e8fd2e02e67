"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device runtime (the DCN-analogue of a 2-host TPU pod —
reference capability: main_DataParallel.py:609). One two-phase Soft-IntroVAE
train step runs over the process-spanning data mesh; batches are fed through
`shard_batch`'s `jax.make_array_from_process_local_data` branch
(parallel/mesh.py:76-78). Prints a parseable result line.

Usage: python tests/multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from sivae_tpu.parallel.distributed import init_distributed, local_batch_slice

    init_distributed(coordinator_address=coordinator,
                     num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 4 * num_processes, n_global

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step

    cfg = dataclasses.replace(
        get_model_config("spatial_1200"),
        in_ch=4, block_setting=((4, 1, 2), (8, 1, 2), (8, 2, 2)),
        input_shape=(16, 24, 16))
    model = make_model(cfg)
    mesh = make_mesh((n_global,), ("data",))

    global_batch = 2 * n_global
    x_global = np.random.RandomState(0).rand(
        global_batch, *cfg.input_shape, 1).astype(np.float32)
    x_local = x_global[local_batch_slice(global_batch)]

    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=10)
    state = replicate_state(state, mesh)
    xb = shard_batch(x_local, mesh)
    assert xb.shape[0] == global_batch, xb.shape  # global shape, local shards

    step = jax.jit(
        make_soft_intro_train_step(
            model, SoftIntroLossConfig(), OptimConfig(), 10, cfg.input_shape),
        donate_argnums=(0,))
    new_state, metrics = step(state, xb)
    lossE = float(metrics["lossE"])
    lossD = float(metrics["lossD"])
    assert np.isfinite(lossE) and np.isfinite(lossD), (lossE, lossD)
    assert int(jax.device_get(new_state.step)) == 1
    print(f"MULTIHOST_OK pid={process_id} lossE={lossE:.6f} lossD={lossD:.6f}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
