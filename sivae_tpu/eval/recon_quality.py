"""Reconstruction-quality report: batch RMSE/PSNR/SSIM + image panels.

Port of the testshow.ipynb workflow (SURVEY §2.1 #22): reconstruct a set of
volumes through the model in eval mode and summarize per-volume fidelity.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from sivae_tpu.models.resnet_vae import reparameterize
from sivae_tpu.ops.metrics import psnr, rmse, ssim


def make_rec_fn(model, val_eps: float = 0.1):
    """One jitted eval-mode reconstruction fn taking (variables, x).

    `variables` MUST be an explicit argument: a per-checkpoint closure
    would bake each checkpoint's params into the executable as constants
    and recompile per checkpoint — a checkpoint sweep then accumulates one
    multi-GB executable per epoch (the round-5 health-gate host OOM)."""

    @jax.jit
    def rec_fn(variables, x):
        (mu, logvar), _ = model.encode(variables["enc"], x)
        z = reparameterize(None, mu, logvar, val_eps=val_eps)
        y, _ = model.decode(variables["dec"], z)
        return y

    return rec_fn


def reconstruction_report(
    model,
    variables,
    voxels: np.ndarray,
    batch_size: int = 8,
    val_eps: float = 0.1,
    panel_path: Optional[str] = None,
    rec_fn=None,
) -> Dict[str, float]:
    """Returns {'rmse', 'psnr', 'ssim3d', 'ssim_center_slice'} means.

    Pass a shared `rec_fn` from make_rec_fn when calling repeatedly with
    different variables (e.g. a checkpoint sweep) so the forward compiles
    once for the whole sweep."""
    if rec_fn is None:
        rec_fn = make_rec_fn(model, val_eps=val_eps)

    n = voxels.shape[0]
    rmses, psnrs, ssims3d, ssims2d = [], [], [], []
    first_batch = None
    for i in range(0, n, batch_size):
        x = voxels[i:i + batch_size]
        pad = batch_size - x.shape[0]
        if pad:  # pad the tail to keep one compiled shape; metrics skip the pad
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        y = np.asarray(rec_fn(variables, x), np.float32)
        if pad:
            x, y = x[:batch_size - pad], y[:batch_size - pad]
        if first_batch is None:
            first_batch = (x, y)
        for j in range(x.shape[0]):
            a, b = x[j, ..., 0], y[j, ..., 0]
            rmses.append(float(rmse(a, b)))
            psnrs.append(float(psnr(a, b)))
            ssims3d.append(float(ssim(a, b)))
            mid = a.shape[0] // 2
            ssims2d.append(float(ssim(a[mid], b[mid])))
    if panel_path and first_batch is not None:
        from sivae_tpu.utils.plots import save_recon_panel

        save_recon_panel(first_batch[0], first_batch[1], panel_path)
    return {
        "rmse": float(np.mean(rmses)),
        "psnr": float(np.mean(psnrs)),
        "ssim3d": float(np.mean(ssims3d)),
        "ssim_center_slice": float(np.mean(ssims2d)),
        "n": len(rmses),
    }
