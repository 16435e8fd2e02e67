from sivae_tpu.utils.logging import MetricsLogger  # noqa: F401
from sivae_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
