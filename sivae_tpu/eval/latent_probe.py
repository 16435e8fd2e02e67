"""Latent-quality evaluation: batch encoding, CN-vs-AD logistic AUC, 2D maps.

TPU-native port of logistic1.ipynb (SURVEY §3.5): the reference encodes one
volume at a time through `net.forward` (cell 7, ~27 vol/s) and fits an
L1 LogisticRegression on the flattened latents (cells 9-13, val ROC-AUC
0.8080 at 1200-d). Here encoding is a jitted batch pass.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sivae_tpu.models.resnet_vae import reparameterize


def encode_dataset(
    model,
    variables,
    voxels: np.ndarray,
    batch_size: int = 16,
    representation: str = "mu",
    val_eps: float = 0.1,
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Encode (N, D, H, W, 1) volumes to (N, latent_dim) float32.

    representation:
      - "mu": posterior mean (deterministic; recommended for retrieval)
      - "z_val": mu + val_eps*std (the reference's fixed-eps eval reparam)
      - "z": sampled z like logistic1.ipynb cell 7 (needs rng)
    """
    enc_vars = variables["enc"]

    @jax.jit
    def enc(x, key):
        (mu, logvar), _ = model.encode(enc_vars, x)
        if representation == "mu":
            z = mu.astype(jnp.float32)
        elif representation == "z_val":
            z = reparameterize(None, mu, logvar, val_eps=val_eps)
        else:
            z = reparameterize(key, mu, logvar)
        return z.reshape(z.shape[0], -1)

    n = voxels.shape[0]
    rng = rng if rng is not None else jax.random.key(0)
    out = []
    # pad the tail batch to keep a single compiled shape
    for i in range(0, n, batch_size):
        chunk = voxels[i:i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        rng, sub = jax.random.split(rng)
        z = np.asarray(enc(chunk, sub))
        out.append(z[:batch_size - pad if pad else batch_size])
    return np.concatenate(out, axis=0)


def logistic_auc(
    train_z: np.ndarray,
    train_y: np.ndarray,
    val_z: np.ndarray,
    val_y: np.ndarray,
) -> Tuple[float, float]:
    """L1 LogisticRegression CN-vs-AD probe (logistic1.ipynb cells 9-13).

    Returns (train_auc, val_auc).
    """
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score

    try:  # sklearn >= 1.8 spells L1 as l1_ratio=1
        clf = LogisticRegression(l1_ratio=1.0, solver="liblinear", max_iter=1000)
        clf.fit(train_z, train_y)
    except (TypeError, ValueError):
        clf = LogisticRegression(penalty="l1", solver="liblinear", max_iter=1000)
        clf.fit(train_z, train_y)
    train_auc = roc_auc_score(train_y, clf.predict_proba(train_z)[:, 1])
    val_auc = roc_auc_score(val_y, clf.predict_proba(val_z)[:, 1])
    return float(train_auc), float(val_auc)


def latent_embedding(z: np.ndarray, method: str = "tsne", n_components: int = 2,
                     pca_dim: int = 50, seed: int = 0,
                     return_method: bool = False):
    """PCA(50) -> t-SNE/UMAP 2D or 3D map (logistic1.ipynb cells 17-24
    render both dimensionalities).

    umap is optional (not a baked dependency); when it is unavailable the
    function falls back to t-SNE, WARNS, and — with return_method=True —
    returns (embedding, method_actually_used) so callers can record which
    method produced the figure.
    """
    import warnings

    from sklearn.decomposition import PCA

    if n_components not in (2, 3):
        raise ValueError(f"n_components must be 2 or 3, got {n_components}")
    x = z
    if pca_dim and z.shape[1] > pca_dim and z.shape[0] > pca_dim:
        x = PCA(n_components=pca_dim, random_state=seed).fit_transform(z)
    if method == "umap":
        try:
            import umap  # type: ignore

            emb = umap.UMAP(n_components=n_components,
                            random_state=seed).fit_transform(x)
            return (emb, "umap") if return_method else emb
        except ImportError:
            warnings.warn("umap-learn is not installed; falling back to "
                          "t-SNE for the latent embedding", stacklevel=2)
            method = "tsne"
    from sklearn.manifold import TSNE

    perplexity = min(30.0, max(2.0, x.shape[0] / 4.0 - 1.0))
    emb = TSNE(n_components=n_components, random_state=seed,
               perplexity=perplexity).fit_transform(x)
    return (emb, "tsne") if return_method else emb


def latent_2d_embedding(z: np.ndarray, method: str = "tsne",
                        pca_dim: int = 50, seed: int = 0) -> np.ndarray:
    """2D special case, kept for back-compat."""
    return latent_embedding(z, method=method, n_components=2,
                            pca_dim=pca_dim, seed=seed)


def save_embedding_scatter(emb: np.ndarray, labels: np.ndarray, path: str,
                           class_names=None, title: str = "") -> None:
    """2D/3D latent scatter colored by class (logistic1 cells 17-24 panels)."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig = plt.figure(figsize=(7, 6))
    is3d = emb.shape[1] == 3
    ax = fig.add_subplot(111, projection="3d") if is3d else fig.add_subplot(111)
    for lab in np.unique(labels):
        pts = emb[labels == lab]
        name = (class_names[int(lab)] if class_names is not None else str(lab))
        ax.scatter(*(pts[:, i] for i in range(emb.shape[1])), s=8, label=name)
    ax.legend()
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
