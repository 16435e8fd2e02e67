"""CBIR retrieval: on-device cosine-kNN over latent vectors.

The reference's end goal is content-based retrieval of similar clinical
cases from latents (README.md:4-21) but ships no retrieval implementation —
only the latent AUC probe. This module provides the missing piece as a
single-matmul MXU kernel: queries x database cosine similarity + top-k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_knn(queries: jnp.ndarray, database: jnp.ndarray, k: int = 10
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine neighbours. queries (Q, Z), database (N, Z) ->
    (scores (Q, k), indices (Q, k)). One (Q, Z) x (Z, N) matmul on the MXU."""
    q = queries.astype(jnp.float32)
    d = database.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    sims = jnp.dot(q, d.T, preferred_element_type=jnp.float32)
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx


def retrieval_precision_at_k(
    query_z: np.ndarray,
    query_labels: np.ndarray,
    db_z: np.ndarray,
    db_labels: np.ndarray,
    k: int = 10,
    exclude_self: bool = False,
) -> float:
    """Mean fraction of the top-k neighbours sharing the query's label.

    k is clamped to the database size (minus the query itself when
    exclude_self) so small galleries report over every neighbour they
    have instead of crashing top_k."""
    kk = k + 1 if exclude_self else k
    kk = min(kk, len(db_z))
    if kk <= (1 if exclude_self else 0):
        raise ValueError(f"database of {len(db_z)} latents is too small "
                         f"for retrieval (exclude_self={exclude_self})")
    _, idx = cosine_knn(jnp.asarray(query_z), jnp.asarray(db_z), k=kk)
    idx = np.asarray(idx)
    if exclude_self:
        idx = idx[:, 1:]
    neighbour_labels = np.asarray(db_labels)[idx]
    hits = neighbour_labels == np.asarray(query_labels)[:, None]
    return float(hits.mean())
