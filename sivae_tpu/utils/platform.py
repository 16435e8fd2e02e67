"""Platform selection helpers.

Some images install a sitecustomize that registers a remote-TPU PJRT
plugin and pins the platform list via `jax.config.update("jax_platforms",
"axon,cpu")`. The jax config takes precedence over the `JAX_PLATFORMS`
env var, so a plain `JAX_PLATFORMS=cpu python ...` still tries the remote
TPU first — and hangs at backend init when its relay is unreachable.
Every CPU-capable entrypoint (CLIs, offline tools) calls one of these
BEFORE its first JAX operation.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply an explicit JAX_PLATFORMS env var over any
    sitecustomize-installed jax.config platform list. No-op when the env
    var is unset (normal on-TPU runs)."""
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def force_cpu() -> None:
    """Pin this process to the CPU backend (env var AND jax config — both
    are needed, see module docstring). For tools that must never touch
    the remote TPU."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
