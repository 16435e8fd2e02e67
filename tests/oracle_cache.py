"""Disk cache for the oracle modules' expensive JAX-side replays.

VERDICT r4 next-#8: the oracle tier costs 25-50 min per module on the
1-core CI host, almost all of it in the XLA:CPU 3D-conv replay of our own
train step — the torch-side reference outputs are already cached as golden
.npz files, but OUR side was recomputed on every run. This module caches
the replay RESULTS (final train-state arrays + loss trajectories), keyed by
a content hash of everything that could change them:

  - every sivae_tpu/**/*.py source file (conservative: any framework
    change invalidates every cached replay),
  - the golden files and the calling test module itself (the replay code
    lives there),
  - the jax/numpy versions.

A cache hit turns a 25-50 min module into the cost of one model.init +
golden imports (~1-2 min); a miss (any relevant change) pays full price
once and re-populates. Entries live in tests/.oracle_cache/ (gitignored —
they are a per-host memoization, not a fixture: committing them would let
a stale replay certify a changed framework if the hash inputs were ever
incomplete, so they intentionally never leave the machine that computed
them).
"""

from __future__ import annotations

import glob
import hashlib
import os
from types import SimpleNamespace

import numpy as np

import jax

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".oracle_cache")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def replay_key(*extra_paths: str) -> str:
    """Content hash over the framework sources + the given files."""
    srcs = glob.glob(os.path.join(_REPO, "sivae_tpu", "**", "*.py"),
                     recursive=True)
    h = hashlib.sha256()
    for p in sorted(srcs) + [os.path.abspath(p) for p in extra_paths]:
        h.update(os.path.relpath(p, _REPO).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    h.update(jax.__version__.encode())
    h.update(np.__version__.encode())
    return h.hexdigest()[:16]


def load(name: str, key: str):
    path = os.path.join(CACHE_DIR, f"{name}-{key}.npz")
    if not os.path.exists(path):
        return None
    return dict(np.load(path, allow_pickle=False))


def save(name: str, key: str, arrays: dict) -> None:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"{name}-{key}.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _path_name(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def tree_to_flat(tree, prefix: str) -> dict:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[f"{prefix}:{_path_name(path)}"] = np.asarray(leaf)
    return out


def tree_from_flat(flat: dict, prefix: str, template):
    """Rebuild a pytree with `template`'s structure from flat arrays."""
    paths, treedef = (jax.tree_util.tree_flatten_with_path(template)[0],
                      jax.tree_util.tree_structure(template))
    leaves = [flat[f"{prefix}:{_path_name(path)}"] for path, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def pack_state(state, extra: dict | None = None) -> dict:
    """Flatten the train-state pieces the oracle asserts consume."""
    flat = {}
    flat.update(tree_to_flat(state.enc_params, "enc_params"))
    flat.update(tree_to_flat(state.dec_params, "dec_params"))
    flat.update(tree_to_flat(state.enc_stats, "enc_stats"))
    flat.update(tree_to_flat(state.dec_stats, "dec_stats"))
    flat.update(tree_to_flat(state.opt_e[0].mu, "opt_e_mu"))
    flat.update(tree_to_flat(state.opt_e[0].nu, "opt_e_nu"))
    flat.update(tree_to_flat(state.opt_d[0].mu, "opt_d_mu"))
    flat.update(tree_to_flat(state.opt_d[0].nu, "opt_d_nu"))
    flat["opt_e_count"] = np.asarray(state.opt_e[0].count)
    flat["opt_d_count"] = np.asarray(state.opt_d[0].count)
    if extra:
        for k, v in extra.items():
            flat[f"extra:{k}"] = np.asarray(v)
    return flat


def unpack_state(flat: dict, imported_init: dict):
    """Rebuild a state-shaped namespace (enc/dec params+stats, opt_e/opt_d
    Adam moments) from a cached flat dict. `imported_init` supplies the
    tree STRUCTURE (the golden import of the init state_dict — identical
    structure to the replayed state's trees)."""
    ep_t = imported_init["enc"]["params"]
    dp_t = imported_init["dec"]["params"]
    es_t = imported_init["enc"]["batch_stats"]
    ds_t = imported_init["dec"]["batch_stats"]
    opt_e = (SimpleNamespace(mu=tree_from_flat(flat, "opt_e_mu", ep_t),
                             nu=tree_from_flat(flat, "opt_e_nu", ep_t),
                             count=flat["opt_e_count"]),)
    opt_d = (SimpleNamespace(mu=tree_from_flat(flat, "opt_d_mu", dp_t),
                             nu=tree_from_flat(flat, "opt_d_nu", dp_t),
                             count=flat["opt_d_count"]),)
    extra = {k[len("extra:"):]: flat[k] for k in flat if k.startswith("extra:")}
    return SimpleNamespace(
        enc_params=tree_from_flat(flat, "enc_params", ep_t),
        dec_params=tree_from_flat(flat, "dec_params", dp_t),
        enc_stats=tree_from_flat(flat, "enc_stats", es_t),
        dec_stats=tree_from_flat(flat, "dec_stats", ds_t),
        opt_e=opt_e, opt_d=opt_d), extra
