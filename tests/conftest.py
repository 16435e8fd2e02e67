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

# --- test tiers -------------------------------------------------------------
# `pytest -m quick` is the <3-min lane for every-change runs on the 1-core
# host; the rest (jitted flagship-shape steps, multihost subprocesses,
# torch parity) is CI/nightly scale. The oracle modules additionally get
# `oracle` (they execute /root/reference's torch trainers — 7-50 min each).
QUICK_MODULES = {
    "test_losses", "test_data", "test_cli", "test_metrics_eval",
    "test_utils", "test_cli_e2e",
}
ORACLE_MODULES = {"test_reference_oracle", "test_reference_oracle_fc",
                  "test_reference_oracle_dp"}

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        if mod in ORACLE_MODULES:
            item.add_marker(pytest.mark.oracle)
