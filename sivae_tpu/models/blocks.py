"""Core 3D conv building blocks (flax.linen, NDHWC layout).

TPU-first re-design of the reference block scheme
(reference models/models.py:8-80):

- `ConvBlock`   — conv3x3x3 -> BN -> act -> AvgPool(s) -> conv3x3x3 -> BN,
  residual (with 1x1 projection when channels change) iff stride == 1.
- `UpBlock`     — conv3x3x3 -> BN -> act -> nearest-Upsample(s) ->
  conv3x3x3 -> BN, same residual rule.

Layout: all tensors are (N, D, H, W, C). XLA on TPU maps channels-last 3D
convolutions directly onto the MXU; NCDHW (the torch layout) would insert
transposes around every conv.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from sivae_tpu.config import ActivationConfig

Array = jnp.ndarray

# checkpoint_name tags for conv outputs; used by the "conv_outs" remat
# policies (save the MXU-heavy results, recompute only the VPU tail in
# backward). checkpoint_name is the identity outside a policied
# jax.checkpoint region. Full-resolution outputs carry their own tag so the
# save set can exclude them ("conv_outs_lo"). Measured at the flagship's
# batch 8 on v5e (tools/perf_sweep.py): saving ALL conv outs ("conv_outs")
# slightly overflows HBM (16.7 GB > 15.75) and XLA inserts
# compress/decompress copies (~19% of step time, seen in the xplane
# profile) — yet it is STILL the fastest variant (5.16 vol/s vs 4.74 for
# "conv_outs_lo", whose full-res conv recompute costs more than the copies,
# vs 4.44 for block-boundary remat).
CONV_OUT = "conv_out"
CONV_OUT_HI_ENC = "conv_out_hi_enc"
CONV_OUT_HI_DEC = "conv_out_hi_dec"
# BatchNorm batch statistics: per-channel (a few hundred floats), i.e. free
# to save — but NOT saving them makes the remat backward re-run the full
# fp32 mean/meansq reductions over every conv output it recomputes (~9% of
# step time in the round-2 xplane profile). Every conv_outs* policy saves
# them.
BN_STAT = "bn_stat"
HI_RES_VOXELS = 200_000  # spatial voxels from which a conv output is "hi"


import os

# Pack saved conv outputs whose channel count under-fills the 128-lane
# registers (C=64 bf16 buffers carry 2x physical padding) into a
# lane-compact (..., W/f, f*C) view before tagging. The reshape is a
# row-major bitcast — (w, c) -> (w//f, (w%f)*C + c) has the same linear
# index. MEASURED NEGATIVE on v5e (tools/perf_sweep.py, flagship batch 8,
# round 3): packing all C=64 saves 4.86 vol/s, hi-res-only 5.04, vs 5.23
# unpacked — XLA's own compression scheduling beats explicit pack copies —
# and the packed save-all program reproducibly fails TPU compilation.
# Kept off by default as a documented negative result (docs/PERF.md).
PACK_SAVES = (os.environ.get("SIVAE_PACK_SAVES", "0").strip().lower()
              in ("1", "true", "on", "yes"))


def _pack_lanes(y: Array):
    """Return (packed_view, unpack) for a lane-compact save of y."""
    c, w = y.shape[-1], y.shape[-2]
    if not PACK_SAVES or c >= 128 or 128 % c != 0:
        return y, None
    f = 128 // c
    if w % f != 0:
        return y, None
    shp = y.shape
    packed = y.reshape(shp[:-2] + (w // f, f * c))
    return packed, lambda p: p.reshape(shp)


def _tag_conv_out(y: Array, scope: str = "enc") -> Array:
    import numpy as np

    voxels = int(np.prod(y.shape[1:-1]))
    if voxels < HI_RES_VOXELS:
        # lo-res saves: never pack — XLA leaves them uncompressed (enough
        # headroom) and forcing pack copies measured SLOWER (4.86 vs 5.14
        # vol/s when packing all C=64 saves, round 3)
        return checkpoint_name(y, CONV_OUT)
    name = CONV_OUT_HI_DEC if scope == "dec" else CONV_OUT_HI_ENC
    packed, unpack = _pack_lanes(y)
    if unpack is None:
        return checkpoint_name(y, name)
    return unpack(checkpoint_name(packed, name))

# He-normal initialisation — parity with the reference's
# `nn.init.kaiming_normal_(w, nonlinearity="leaky_relu")` applied to every
# conv (reference utils/my_trainer.py:511-514): gain 2.0 / fan_in, normal.
he_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def make_act(cfg: ActivationConfig, which: str = "body") -> Callable[[Array], Array]:
    name = cfg.body_act if which == "body" else cfg.decoder_tail_act
    if name == "leaky_relu":
        slope = cfg.negative_slope
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if name == "relu":
        return nn.relu
    raise ValueError(f"unknown activation {name!r}")


def avg_pool3d(x: Array, stride: int) -> Array:
    """Non-overlapping 3D average pool (torch AvgPool3d(kernel_size=s))."""
    if stride == 1:
        return x
    s = (stride, stride, stride)
    return nn.avg_pool(x, window_shape=s, strides=s)


def upsample_nearest3d(x: Array, scale: int) -> Array:
    """Nearest-neighbour 3D upsample (torch nn.Upsample(scale_factor=s))."""
    if scale == 1:
        return x
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    x = jnp.repeat(x, scale, axis=3)
    return x


# Dropout cost note (v5e, flagship step, batch 8): two alternative mask
# generators were measured and rejected — uint8-threshold threefry masks
# (4x fewer random words: 1566ms/step vs 1550ms baseline, a wash; the cost
# is the mask APPLY traffic, not bit generation) and the XLA
# rng-bit-generator ("rbg" keys: fast but schedule-DEPENDENT output, which
# changed losses by 5% across remat variants and would silently break the
# DP == single-device guarantee). nn.Dropout over threefry stays.


class _PallasConvCore(nn.Module):
    """Drop-in for nn.Conv (3x3x3 SAME stride-1) using the Pallas
    implicit-GEMM kernel. Named "Conv_0" by callers so the param tree is
    identical to the nn.Conv path (checkpoints interchange freely)."""

    features: int
    use_bias: bool
    kernel_init: Any
    dtype: Any
    param_dtype: Any
    tag_scope: str = "enc"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from sivae_tpu.kernels.conv3d import conv3d_same_pallas

        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, 3, x.shape[-1], self.features), self.param_dtype)
        y = conv3d_same_pallas(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return _tag_conv_out(y, self.tag_scope)


def resolve_small_ch(flag: Any) -> bool:
    """Resolve SpatialVAEConfig.use_pallas_small_ch ("auto" => TPU only)."""
    if flag == "auto":
        return jax.default_backend() == "tpu"
    return bool(flag)


class _PallasSmallOutCore(nn.Module):
    """3x3x3 SAME conv to ONE output channel via the Pallas VPU stencil
    (kernels/conv3d_small.py). Named "Conv_0" by the caller so the param
    tree matches the nn.Conv path (checkpoints interchange freely)."""

    use_bias: bool
    kernel_init: Any
    dtype: Any
    param_dtype: Any
    tag_scope: str = "dec"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from sivae_tpu.kernels.conv3d_small import conv3d_to1

        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, 3, x.shape[-1], 1), self.param_dtype)
        interp = jax.default_backend() != "tpu"
        y = conv3d_to1(x.astype(self.dtype), kernel.astype(self.dtype), interp)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (1,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return _tag_conv_out(y, self.tag_scope)


class _PallasSmallInCore(nn.Module):
    """3x3x3 SAME conv from ONE input channel via the Pallas VPU stencil.
    Named "Conv_0" by the caller (param tree matches nn.Conv)."""

    features: int
    use_bias: bool
    kernel_init: Any
    dtype: Any
    param_dtype: Any
    tag_scope: str = "enc"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from sivae_tpu.kernels.conv3d_small import conv3d_from1

        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, 3, 1, self.features), self.param_dtype)
        interp = jax.default_backend() != "tpu"
        y = conv3d_from1(x.astype(self.dtype), kernel.astype(self.dtype), interp)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return _tag_conv_out(y, self.tag_scope)


class _FusedUpConvCore(nn.Module):
    """upsample_nearest(2) + 3x3x3 SAME conv as 8 parity convs (exact,
    2.4x fewer FLOPs, no 8x intermediate — see ops/fused_upconv.py).
    Named "Conv_0" by the caller: the param tree matches nn.Conv."""

    features: int
    use_bias: bool
    kernel_init: Any
    dtype: Any
    param_dtype: Any
    tag_scope: str = "enc"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from sivae_tpu.ops.fused_upconv import upsampled_conv3x3

        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype).astype(self.dtype)
        return _tag_conv_out(
            upsampled_conv3x3(x.astype(self.dtype), kernel.astype(self.dtype),
                              bias), self.tag_scope)


class Conv3d(nn.Module):
    """3x3x3 (or custom) conv in NDHWC with He init."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    zero_init: bool = False
    use_pallas: bool = False
    use_pallas_small: bool = False
    tag_scope: str = "enc"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = nn.initializers.zeros if self.zero_init else he_normal
        if self.use_pallas_small and self.kernel_size == (3, 3, 3):
            from sivae_tpu.kernels.conv3d_small import fits_vmem

            c_big = max(x.shape[-1], self.features)
            ok = fits_vmem(x.shape[2], x.shape[3], c_big,
                           jnp.dtype(self.dtype).itemsize)
            if ok and self.features == 1:
                return _PallasSmallOutCore(
                    use_bias=self.use_bias, kernel_init=init,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    tag_scope=self.tag_scope, name="Conv_0")(x)
            if ok and x.shape[-1] == 1 and self.features > 1:
                return _PallasSmallInCore(
                    features=self.features, use_bias=self.use_bias,
                    kernel_init=init, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    tag_scope=self.tag_scope, name="Conv_0")(x)
        if self.use_pallas and self.kernel_size == (3, 3, 3):
            return _PallasConvCore(
                features=self.features, use_bias=self.use_bias,
                kernel_init=init, dtype=self.dtype,
                param_dtype=self.param_dtype, tag_scope=self.tag_scope,
                name="Conv_0")(x)
        return _tag_conv_out(nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=(1, 1, 1),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x), self.tag_scope)


# NOTE (round 5): the fused conv+BN-stat megakernel's MODEL integration
# (_KernelLeaf/_ConvKernelHolder/_BNStatLeaf/_BNStatHolder/fused_conv_bn_fits/
# _conv_bn and the use_fused_stats block paths) was removed after the TPU A/B
# finally ran and the kernel LOST decisively (docs/AB_MEGAKERNEL_r05.json:
# pallas fused stage 31.0 ms vs XLA 24.0 ms on bf16[8,80,96,80,64]); the
# kernel itself stays in kernels/conv3d_fused.py as the recorded experiment,
# exercised by tools/megakernel_ab.py and tests/test_pallas_fused.py.
# See docs/PERF.md "Round-5" for the full table and decision.


class _BNCore(nn.Module):
    """Faithful reimplementation of flax nn.BatchNorm (use_fast_variance,
    force_float32_reductions, same op order => same HLO), plus
    checkpoint_name tags on the batch mean/var so the conv_outs remat
    policies SAVE them — without the tags the backward recomputes every
    train-mode stat reduction over the full-resolution conv outputs.
    Named "BatchNorm_0" by the wrapper so the param/batch_stats tree is
    identical to the nn.BatchNorm version (checkpoints interchange)."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool) -> Array:
        feature_shape = (x.shape[-1],)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               feature_shape)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            mu2 = jnp.mean(xf * xf, axes)
            var = jnp.maximum(0.0, mu2 - mean * mean)
            mean = checkpoint_name(mean, BN_STAT)
            var = checkpoint_name(var, BN_STAT)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        # flax _normalize op order: y = x - mean; mul = rsqrt(var+eps)*scale;
        # y = y*mul + bias; cast to dtype
        shape = (1,) * (x.ndim - 1) + feature_shape
        y = x - mean.reshape(shape)
        mul = jax.lax.rsqrt(var.reshape(shape) + self.epsilon)
        scale = self.param("scale", nn.initializers.ones,
                           feature_shape, self.param_dtype)
        mul = mul * scale.reshape(shape)
        y = y * mul
        bias = self.param("bias", nn.initializers.zeros,
                          feature_shape, self.param_dtype)
        y = y + bias.reshape(shape)
        return jnp.asarray(y, self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm over (N, D, H, W) with running stats.

    momentum=0.9 here == torch BatchNorm3d momentum=0.1 (flax keeps
    `momentum` fraction of the old running stat). eps matches torch 1e-5.
    """

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        return _BNCore(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="BatchNorm_0",
        )(x, use_running_average=not train)


class ConvBlock(nn.Module):
    """Downsampling residual block (reference models/models.py:8-43).

    conv3 -> BN -> act -> AvgPool(stride) -> conv3 -> BN; when stride == 1
    the input is added back (1x1 projection if channel counts differ) before
    the output activation.
    """

    out_ch: int
    stride: int
    act: ActivationConfig
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    tag_scope: str = "enc"

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        act = make_act(self.act)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ckw = dict(use_pallas=self.use_pallas, tag_scope=self.tag_scope, **kw)
        h = Conv3d(self.out_ch, use_bias=self.use_bias, **ckw)(x)
        h = BatchNorm(**kw)(h, train)
        h = act(h)
        h = avg_pool3d(h, self.stride)
        h = Conv3d(self.out_ch, use_bias=self.use_bias, **ckw)(h)
        h = BatchNorm(**kw)(h, train)
        if self.stride == 1:
            shortcut = x
            if x.shape[-1] != self.out_ch:
                shortcut = Conv3d(self.out_ch, kernel_size=(1, 1, 1), use_bias=True, **kw)(x)
            h = h + shortcut
        return act(h)


class UpBlock(nn.Module):
    """Upsampling residual block (reference models/models.py:46-80).

    conv3 (keeps in_ch) -> BN -> act -> nearest-upsample(stride) ->
    conv3 (to out_ch) -> BN; residual iff stride == 1.
    """

    out_ch: int
    stride: int
    act: ActivationConfig
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    fuse_upconv: bool = True
    tag_scope: str = "dec"

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        act = make_act(self.act)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ckw = dict(use_pallas=self.use_pallas, tag_scope=self.tag_scope, **kw)
        in_ch = x.shape[-1]
        h = Conv3d(in_ch, use_bias=self.use_bias, **ckw)(x)
        h = BatchNorm(**kw)(h, train)
        h = act(h)
        if self.fuse_upconv and self.stride == 2:
            # exact upsample+conv fusion; the inner module is named
            # "Conv3d_1/Conv_0" so the param tree matches the unfused path
            outer = self

            class _Named(nn.Module):
                @nn.compact
                def __call__(self, h_in):
                    return _FusedUpConvCore(
                        features=outer.out_ch, use_bias=outer.use_bias,
                        kernel_init=he_normal, dtype=outer.dtype,
                        param_dtype=outer.param_dtype,
                        tag_scope=outer.tag_scope, name="Conv_0")(h_in)

            h = _Named(name="Conv3d_1")(h)
        else:
            h = upsample_nearest3d(h, self.stride)
            h = Conv3d(self.out_ch, use_bias=self.use_bias, **ckw)(h)
        h = BatchNorm(**kw)(h, train)
        if self.stride == 1:
            shortcut = x
            if in_ch != self.out_ch:
                shortcut = Conv3d(self.out_ch, kernel_size=(1, 1, 1), use_bias=True, **kw)(x)
            h = h + shortcut
        return act(h)


def remat_policy_by_name(name: Optional[str]):
    """Resolve a config remat_policy string to a jax.checkpoint policy."""
    import jax

    if name is None:
        return None
    if name == "conv_outs":
        return jax.checkpoint_policies.save_only_these_names(
            CONV_OUT, CONV_OUT_HI_ENC, CONV_OUT_HI_DEC, BN_STAT)
    if name == "conv_outs_lo":
        return jax.checkpoint_policies.save_only_these_names(CONV_OUT, BN_STAT)
    if name == "conv_outs_no_dec_hi":
        return jax.checkpoint_policies.save_only_these_names(
            CONV_OUT, CONV_OUT_HI_ENC, BN_STAT)
    if name == "conv_outs_no_enc_hi":
        return jax.checkpoint_policies.save_only_these_names(
            CONV_OUT, CONV_OUT_HI_DEC, BN_STAT)
    raise ValueError(f"unknown remat_policy {name!r}")


def maybe_remat(block_cls, remat: bool, policy: Optional[str] = None):
    """Wrap a block module class in nn.remat (activation rematerialization).

    Block outputs stay live across the step's many forwards; block internals
    are recomputed in the backward pass — jax.checkpoint at the natural
    block boundary (`train` flag is static argument 2 of __call__).

    policy="conv_outs" additionally saves every tagged conv output inside
    the block so the backward recomputes only BN/act/pool, not the convs.
    """
    if not remat:
        return block_cls
    return nn.remat(block_cls, static_argnums=(2,),
                    policy=remat_policy_by_name(policy))


class ConvBNAct(nn.Module):
    """conv3 -> BN -> act [-> dropout] — the stem / plain-stage unit."""

    out_ch: int
    act: ActivationConfig
    dropout: float = 0.0
    use_bias: bool = True
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    use_pallas_small: bool = False
    upsample2_fused: bool = False  # prepend nearest-up(2), fused into the conv
    tag_scope: str = "enc"

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.upsample2_fused:
            outer = self

            class _Named(nn.Module):
                @nn.compact
                def __call__(self, h_in):
                    return _FusedUpConvCore(
                        features=outer.out_ch, use_bias=outer.use_bias,
                        kernel_init=he_normal, dtype=outer.dtype,
                        param_dtype=outer.param_dtype,
                        tag_scope=outer.tag_scope, name="Conv_0")(h_in)

            h = _Named(name="Conv3d_0")(x)
        else:
            h = Conv3d(self.out_ch, kernel_size=self.kernel_size,
                       use_bias=self.use_bias, use_pallas=self.use_pallas,
                       use_pallas_small=self.use_pallas_small,
                       tag_scope=self.tag_scope, **kw)(x)
        h = BatchNorm(**kw)(h, train)
        h = make_act(self.act)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        return h
