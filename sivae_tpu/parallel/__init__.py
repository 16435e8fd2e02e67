from sivae_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate_state,
    data_sharding,
)
