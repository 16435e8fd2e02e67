"""Plot writers: loss curves, KL-stat curves, reconstruction panels.

Reproduces utils/train_result.py (result_S_IntroVAE :49-62,
result_rec_kls_loss :65-78, result_ae :35-46) and the side-by-side
original/reconstruction slice panels with RMSE+SSIM annotations
(utils/my_trainer.py:92-127) without skimage (SSIM from sivae_tpu.ops.metrics).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from sivae_tpu.ops.metrics import rmse, ssim  # noqa: E402


def plot_soft_intro_losses(history: Dict[str, List[float]], path: str) -> None:
    """4-curve trainE/valE/trainD/valD figure (train_result.py:49-62)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for key in ("train_lossE", "val_lossE", "train_lossD", "val_lossD"):
        if key in history:
            ax.plot(history[key], label=key)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(os.path.join(path, "soft_intro_losses.png"), dpi=100)
    plt.close(fig)


def plot_kl_stats(history: Dict[str, List[float]], path: str) -> None:
    """kls_real/fake/rec + rec_errs curves (train_result.py:65-78)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for key in ("kls_real", "kls_fake", "kls_rec", "rec_errs"):
        if key in history:
            ax.plot(history[key], label=key)
    ax.set_xlabel("epoch")
    ax.legend()
    fig.savefig(os.path.join(path, "kl_stats.png"), dpi=100)
    plt.close(fig)


def plot_ae_losses(history: Dict[str, List[float]], path: str) -> None:
    fig, ax = plt.subplots(figsize=(8, 5))
    for key in ("train_loss", "val_loss"):
        if key in history:
            ax.plot(history[key], label=key)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(os.path.join(path, "ae_losses.png"), dpi=100)
    plt.close(fig)


def save_recon_panel(
    originals: np.ndarray,
    outputs: np.ndarray,
    filename: str,
    n: int = 8,
    slice_axis_frac: float = 0.625,  # slice 50 of 80 in the reference
) -> None:
    """2xN panel: originals on top, reconstructions below, per-pair RMSE and
    SSIM annotated (my_trainer.py:92-127). Volumes are NDHWC or (N,D,H,W)."""
    originals = np.asarray(originals, np.float32)
    outputs = np.asarray(outputs, np.float32)
    if originals.ndim == 5:
        originals, outputs = originals[..., 0], outputs[..., 0]
    n = min(n, originals.shape[0])
    # reference view: volume.transpose(1,2,0)[50] then vertical flip
    # (my_trainer.py:100) — slice 50/80 of the H axis after transpose
    k = min(int(originals.shape[2] * slice_axis_frac), originals.shape[2] - 1)
    fig = plt.figure(figsize=(2.2 * n, 6))
    for i in range(n):
        img = np.flip(originals[i].transpose(1, 2, 0)[k], 0)
        out = np.flip(outputs[i].transpose(1, 2, 0)[k], 0)
        ax1 = fig.add_subplot(2, n, i + 1)
        ax1.set_title(f"original{i + 1}", fontsize=10)
        ax1.imshow(img, cmap="gray")
        ax1.axis("off")
        ax2 = fig.add_subplot(2, n, n + i + 1)
        r = float(rmse(img, out))
        s = float(ssim(img, out, data_range=max(1e-6, float(img.max() - img.min()))))
        ax2.set_title(f"rmse:{r:.3f} ssim:{s:.3f}", fontsize=9)
        ax2.imshow(out, cmap="gray")
        ax2.axis("off")
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename, dpi=90)
    plt.close(fig)
