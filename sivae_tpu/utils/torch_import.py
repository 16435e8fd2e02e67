"""Import reference PyTorch .pth checkpoints into sivae_tpu models.

Users of the reference repo hold trained `SoftIntroVAE` state_dicts
(saved per epoch, utils/my_trainer.py:476-480; loaded for eval in
logistic1.ipynb cell 5). This module maps those weights onto our spatial
model's param/stat pytrees so retrieval/eval can run on TPU without
retraining.

Key layout mapping (reference models/models.py -> sivae_tpu):
  encoder.blocks.0.{0 conv,1 bn}            -> enc CheckpointConvBNAct_0
  encoder.blocks.k.0.block.{0,1,4,5}        -> enc CheckpointConvBlock_{k-1}
  encoder.blocks.k.0.shortcut (1x1 proj)    -> ... Conv3d_2 (only when used)
  encoder.mu / encoder.var                  -> mu / logvar heads
  decoder.blocks.0.{0,1}                    -> dec CheckpointConvBNAct_0
  decoder.blocks.k.0.block.{0,1,4,5}        -> dec CheckpointUpBlock_{k-1}
  decoder.blocks.last.0                     -> dec Conv3d_0 (output conv)

Conv kernels transpose OIDHW -> DHWIO; BN weight/bias -> scale/bias and
running_mean/var -> mean/var. torch's BuildingBlock constructs a projection
conv even when the residual path is unused (stride != 1, models.py:28-35);
those orphan weights are skipped.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # save_checkpoint format (my_trainer.py:135-143)
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    if old.shape != value.shape:
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{old.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def _import_conv(sd, tkey, params, fpath) -> None:
    _set(params, fpath + ("kernel",), _conv_w(sd[tkey + ".weight"]))
    if tkey + ".bias" in sd:
        _set(params, fpath + ("bias",), sd[tkey + ".bias"])


def _import_bn(sd, tkey, params, stats, fpath) -> None:
    _set(params, fpath + ("scale",), sd[tkey + ".weight"])
    _set(params, fpath + ("bias",), sd[tkey + ".bias"])
    _set(stats, fpath + ("mean",), sd[tkey + ".running_mean"])
    _set(stats, fpath + ("var",), sd[tkey + ".running_var"])


def import_spatial_soft_intro_vae(
    state_dict: Dict[str, np.ndarray],
    cfg,
    variables: Dict[str, Any],
) -> Dict[str, Any]:
    """Returns new variables {'enc': {'params', 'batch_stats'}, 'dec': ...}
    with reference weights loaded. `variables` provides the target structure
    (from model.init) and is not mutated."""
    import jax

    out = jax.tree_util.tree_map(np.asarray, variables)
    enc_p, enc_s = out["enc"]["params"], out["enc"]["batch_stats"]
    dec_p, dec_s = out["dec"]["params"], out["dec"]["batch_stats"]
    sd = state_dict
    bn = ("BatchNorm_0",)

    # ---- encoder stem (torch blocks.0) ----
    _import_conv(sd, "encoder.blocks.0.0", enc_p,
                 ("CheckpointConvBNAct_0", "Conv3d_0", "Conv_0"))
    _import_bn(sd, "encoder.blocks.0.1", enc_p, enc_s,
               ("CheckpointConvBNAct_0", "BatchNorm_0", "BatchNorm_0"))

    # ---- encoder blocks ----
    k = 1
    in_ch = cfg.in_ch
    for c, n, s in cfg.block_setting:
        for i in range(n):
            stride = s if i == 0 else 1
            t = f"encoder.blocks.{k}.0"
            f = f"CheckpointConvBlock_{k - 1}"
            _import_conv(sd, t + ".block.0", enc_p, (f, "Conv3d_0", "Conv_0"))
            _import_bn(sd, t + ".block.1", enc_p, enc_s, (f, "BatchNorm_0", "BatchNorm_0"))
            _import_conv(sd, t + ".block.4", enc_p, (f, "Conv3d_1", "Conv_0"))
            _import_bn(sd, t + ".block.5", enc_p, enc_s, (f, "BatchNorm_1", "BatchNorm_0"))
            if stride == 1 and in_ch != c:
                _import_conv(sd, t + ".shortcut", enc_p, (f, "Conv3d_2", "Conv_0"))
            in_ch = c
            k += 1

    # ---- encoder heads ----
    if "encoder.mu.weight" in sd:
        _import_conv(sd, "encoder.mu", enc_p, ("mu", "Conv_0"))
        _import_conv(sd, "encoder.var", enc_p, ("logvar", "Conv_0"))
    elif "encoder.conv.0.weight" in sd:  # CAE head
        _import_conv(sd, "encoder.conv.0", enc_p, ("head", "Conv_0"))

    # ---- decoder input block (torch blocks.0) ----
    _import_conv(sd, "decoder.blocks.0.0", dec_p,
                 ("CheckpointConvBNAct_0", "Conv3d_0", "Conv_0"))
    _import_bn(sd, "decoder.blocks.0.1", dec_p, dec_s,
               ("CheckpointConvBNAct_0", "BatchNorm_0", "BatchNorm_0"))

    # ---- decoder up-blocks (mirror walk, models.py:124-135) ----
    k = 1
    rev = cfg.block_setting[::-1]
    in_ch = rev[0][0]
    for i in range(len(rev)):
        c, n, s = rev[i]
        nc = cfg.in_ch if i == len(rev) - 1 else rev[i + 1][0]
        for j in range(n):
            stride = s if j == n - 1 else 1
            out_c = nc if j == n - 1 else c
            t = f"decoder.blocks.{k}.0"
            f = f"CheckpointUpBlock_{k - 1}"
            _import_conv(sd, t + ".block.0", dec_p, (f, "Conv3d_0", "Conv_0"))
            _import_bn(sd, t + ".block.1", dec_p, dec_s, (f, "BatchNorm_0", "BatchNorm_0"))
            _import_conv(sd, t + ".block.4", dec_p, (f, "Conv3d_1", "Conv_0"))
            _import_bn(sd, t + ".block.5", dec_p, dec_s, (f, "BatchNorm_1", "BatchNorm_0"))
            if stride == 1 and in_ch != out_c:
                _import_conv(sd, t + ".shortcut", dec_p, (f, "Conv3d_2", "Conv_0"))
            in_ch = out_c
            k += 1

    # ---- decoder output conv (torch blocks.{k}.0) ----
    _import_conv(sd, f"decoder.blocks.{k}.0", dec_p, ("Conv3d_0", "Conv_0"))
    return out


def _fc_perm_in(fo: int, d: int, h: int, w: int) -> np.ndarray:
    """Feature permutation torch-flatten(C,D,H,W) -> ours (D,H,W,C)."""
    idx = np.arange(fo * d * h * w).reshape(fo, d, h, w)
    return idx.transpose(1, 2, 3, 0).reshape(-1)


def import_fc_soft_intro_vae(
    state_dict: Dict[str, np.ndarray],
    cfg,
    variables: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference models/mymodel.py SoftIntroVAE state_dict onto the
    FC-latent model (reference mymodel.py:51-230).

    The torch fc head is one Linear chunked into (mu, logvar)
    (mymodel.py:125,142); we split its rows. Flatten-order differences
    (torch C-major vs our channels-last) are fixed by permuting the fc
    input features and the dfc output features.
    """
    import jax

    out = jax.tree_util.tree_map(np.asarray, variables)
    enc_p, enc_s = out["enc"]["params"], out["enc"]["batch_stats"]
    dec_p, dec_s = out["dec"]["params"], out["dec"]["batch_stats"]
    sd = state_dict
    fo = cfg.forth_ch
    d, h, w = cfg.bottleneck_spatial_shape
    z = cfg.z_ch

    # ---- encoder convs/BNs in call order -> CheckpointConvBNAct_i ----
    enc_layers = [  # (torch prefix, conv idx, bn idx)
        ("encoder.block1", 0, 1), ("encoder.block1", 3, 4),
        ("encoder.block2", 0, 1), ("encoder.block2", 3, 4),
        ("encoder.block3", 0, 1), ("encoder.block3", 3, 4),
        ("encoder.block4short", 0, 1),
        ("encoder.block5", 0, 1),
        ("encoder.block6", 0, 1), ("encoder.block6", 4, 5),
        ("encoder.block7", 0, 1),
    ]
    for i, (pre, ci, bi) in enumerate(enc_layers):
        f = f"CheckpointConvBNAct_{i}"
        _import_conv(sd, f"{pre}.{ci}", enc_p, (f, "Conv3d_0", "Conv_0"))
        _import_bn(sd, f"{pre}.{bi}", enc_p, enc_s, (f, "BatchNorm_0", "BatchNorm_0"))
    # block7's second conv+BN are bare modules in our encoder
    _import_conv(sd, "encoder.block7.3", enc_p, ("Conv3d_0", "Conv_0"))
    _import_bn(sd, "encoder.block7.4", enc_p, enc_s, ("BatchNorm_0", "BatchNorm_0"))

    # ---- fc head: rows 0:z -> mu, z:2z -> logvar; permute input features
    perm = _fc_perm_in(fo, d, h, w)
    fcw = sd["encoder.fc.weight"]          # (2z, fo*d*h*w), torch C-major in
    fcb = sd["encoder.fc.bias"]
    _set(enc_p, ("mu", "kernel"), fcw[:z][:, perm].T)
    _set(enc_p, ("mu", "bias"), fcb[:z])
    _set(enc_p, ("logvar", "kernel"), fcw[z:][:, perm].T)
    _set(enc_p, ("logvar", "bias"), fcb[z:])

    # ---- decoder dfc: permute OUTPUT features (torch reshapes to (fo,d,h,w))
    dfw = sd["decoder.dfc.0.weight"]       # (fo*d*h*w, z)
    dfb = sd["decoder.dfc.0.bias"]
    _set(dec_p, ("Dense_0", "kernel"), dfw[perm].T)
    _set(dec_p, ("Dense_0", "bias"), dfb[perm])

    # ---- decoder convs/BNs ----
    # call order: CBA_0(block1 conv0), Conv3d_0+BatchNorm_0 (block1 conv3),
    # CBA_1(block2u conv0), CBA_2(block2u conv4, fused up),
    # CBA_3(block3 conv0), Conv3d_1+BatchNorm_1 (block3 conv3),
    # CBA_4..9 (block4u/5u/6u conv0+conv4), Conv3d_2 (last_block conv0)
    cba_layers = [
        ("decoder.block1", 0, 1, "CheckpointConvBNAct_0"),
        ("decoder.block2u", 0, 1, "CheckpointConvBNAct_1"),
        ("decoder.block2u", 4, 5, "CheckpointConvBNAct_2"),
        ("decoder.block3", 0, 1, "CheckpointConvBNAct_3"),
        ("decoder.block4u", 0, 1, "CheckpointConvBNAct_4"),
        ("decoder.block4u", 4, 5, "CheckpointConvBNAct_5"),
        ("decoder.block5u", 0, 1, "CheckpointConvBNAct_6"),
        ("decoder.block5u", 4, 5, "CheckpointConvBNAct_7"),
        ("decoder.block6u", 0, 1, "CheckpointConvBNAct_8"),
        ("decoder.block6u", 4, 5, "CheckpointConvBNAct_9"),
    ]
    for pre, ci, bi, f in cba_layers:
        _import_conv(sd, f"{pre}.{ci}", dec_p, (f, "Conv3d_0", "Conv_0"))
        _import_bn(sd, f"{pre}.{bi}", dec_p, dec_s, (f, "BatchNorm_0", "BatchNorm_0"))
    _import_conv(sd, "decoder.block1.3", dec_p, ("Conv3d_0", "Conv_0"))
    _import_bn(sd, "decoder.block1.4", dec_p, dec_s, ("BatchNorm_0", "BatchNorm_0"))
    _import_conv(sd, "decoder.block3.3", dec_p, ("Conv3d_1", "Conv_0"))
    _import_bn(sd, "decoder.block3.4", dec_p, dec_s, ("BatchNorm_1", "BatchNorm_0"))
    _import_conv(sd, "decoder.last_block.0", dec_p, ("Conv3d_2", "Conv_0"))
    return out


def import_torch_checkpoint(path: str, cfg, variables: Dict[str, Any]) -> Dict[str, Any]:
    from sivae_tpu.config import FCVAEConfig

    sd = load_torch_state_dict(path)
    if isinstance(cfg, FCVAEConfig):
        return import_fc_soft_intro_vae(sd, cfg, variables)
    return import_spatial_soft_intro_vae(sd, cfg, variables)
