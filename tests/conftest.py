"""Test config: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY §4 test plan).

Note: this image's sitecustomize registers the axon (remote TPU) PJRT
plugin at interpreter start and calls jax.config.update("jax_platforms",
"axon,cpu"), which overrides the JAX_PLATFORMS env var. Tests must reset
the *config* back to cpu before the first JAX operation, otherwise every
test process tries to claim the remote TPU (minutes of wall-clock).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
