"""Voxel preprocessing: clip to [0, 4*sigma], min-max normalize to [0, 1].

Reference semantics: utils/data_load.py:25-30 (`BrainDataset._preprocess`),
executed per item in DataLoader worker processes. The TPU-native design
moves this onto the device as a vmapped, jit-fusable function so raw
volumes stream to HBM once and normalization fuses into the first conv's
input pipeline — no host-side python loop per item.

A numpy twin is kept for host-side tooling and parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def preprocess_voxel_np(voxel: np.ndarray) -> np.ndarray:
    """Host/numpy reference implementation (per volume, no channel axis)."""
    cut = 4.0 * np.std(voxel)
    v = np.clip(voxel, 0.0, cut)
    lo, hi = np.min(v), np.max(v)
    return ((v - lo) / (hi - lo)).astype(np.float32)


def _preprocess_one(voxel: Array) -> Array:
    v32 = voxel.astype(jnp.float32)
    cut = 4.0 * jnp.std(v32)
    v = jnp.clip(v32, 0.0, cut)
    lo = jnp.min(v)
    hi = jnp.max(v)
    return (v - lo) / (hi - lo)


@jax.jit
def preprocess_batch(voxels: Array) -> Array:
    """(B, D, H, W) raw -> (B, D, H, W, 1) float32 in [0, 1].

    Statistics (sigma, min, max) are per-volume, matching the reference's
    per-item preprocessing.
    """
    out = jax.vmap(_preprocess_one)(voxels)
    return out[..., None]
