"""Checkpoint-sweep evaluation: reconstruction quality across epochs.

Port of testshow.ipynb cells 18-22 (SURVEY §2.1 #22): the reference loads
each epoch's .pth and renders recon panels to eyeball convergence. Here the
sweep walks an orbax run directory (or a list of torch .pth files) and
returns per-checkpoint RMSE/PSNR/SSIM, optionally writing panels.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from sivae_tpu.eval.recon_quality import reconstruction_report


def sweep_checkpoints(
    model,
    cfg,
    voxels: np.ndarray,
    ckpt_dir: Optional[str] = None,
    torch_paths: Sequence[str] = (),
    batch_size: int = 8,
    panel_dir: Optional[str] = None,
) -> List[Dict[str, float]]:
    """Evaluate every checkpoint; returns [{'step': s, 'rmse': ..., ...}]."""
    import jax
    import jax.numpy as jnp

    results: List[Dict[str, float]] = []

    def eval_variables(tag, variables):
        panel = os.path.join(panel_dir, f"recon_{tag}.jpg") if panel_dir else None
        rep = reconstruction_report(model, variables, voxels,
                                    batch_size=batch_size, panel_path=panel)
        rep["checkpoint"] = tag
        results.append(rep)

    if ckpt_dir:
        from sivae_tpu.config import OptimConfig
        from sivae_tpu.train.state import create_train_state
        from sivae_tpu.utils.checkpoint import CheckpointManager

        template = create_train_state(
            model, jax.random.key(0),
            jnp.zeros((1,) + tuple(cfg.input_shape) + (1,), jnp.float32),
            OptimConfig(), 1)
        mgr = CheckpointManager(ckpt_dir)
        for step in sorted(mgr._mgr.all_steps()):
            state = mgr.restore(template, step)
            variables = {
                "enc": {"params": state.enc_params, "batch_stats": state.enc_stats},
                "dec": {"params": state.dec_params, "batch_stats": state.dec_stats}}
            eval_variables(str(step), variables)

    if torch_paths:
        from sivae_tpu.utils.torch_import import import_torch_checkpoint

        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1,) + tuple(cfg.input_shape) + (1,), jnp.float32))
        for p in torch_paths:
            imported = import_torch_checkpoint(p, cfg, variables)
            eval_variables(os.path.basename(p), imported)

    return results
