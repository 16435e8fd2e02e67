"""Pallas TPU megakernel: fused [BN-apply + LeakyReLU] -> 3x3x3 conv ->
[BN-stat partials], NDHWC, SAME stride-1.

VERDICT r3 next-#2: measure, don't estimate, the fused-epilogue conv on the
dominant flagship shape bf16[8,80,96,80,64] -> 64 (the conv stack at
reference models/models.py:83-145). The round-3 profile buckets this kernel
attacks (docs/PERF.md):
  - 19% layout copies: XLA's conv picks the conv layout {4,0,3,2,1}; the
    surrounding BN/act fusions use the default layout, so every hi-res conv
    is bracketed by 0.59 GiB layout-conversion copies. A Pallas conv reads
    and writes default-layout arrays - the copies do not exist.
  - 9% convert_reduce fusions: BN batch-stat reductions re-read the conv
    output from HBM. Here per-(b,d) partial sums and sum-of-squares fall
    out of the accumulator while it is still in VMEM.
  - part of the 10% elementwise bucket: the previous stage's BN-apply +
    LeakyReLU (an affine y = x*a + b with a = gamma*rsqrt(var+eps),
    b = beta - mean*a, then the leak) is applied on the input plane as it
    is staged into the padded scratch - one fused pass instead of a
    separate HBM round trip.

Conv restructuring vs kernels/conv3d.py (v1, 36 TF/s): v1 contracts
(M, 3C) x (3C, Co) per kernel row - N = Co = 64 fills half the MXU's 128
output lanes, the same quarter-ceiling XLA hits (~51 TF/s). Here the three
kernel rows are stacked into the OUTPUT columns instead: one
(M', 3C) x (3C, 3*Co) matmul per depth tap computes
Yp[p, kh*Co+co] = sum_{kw,c} pad[p, w+kw, c] * w[kh, kw, c, co]
for every padded row p, and the epilogue combines three shifted row-views
out[h] = Yp[h, g0] + Yp[h+1, g1] + Yp[h+2, g2] on the VPU. K = N = 192
(1.5 MXU tiles each) instead of K=192/N=64 - 3x the work per pass over the
same patch traffic, with ~(H+2)/H extra FLOPs on the two padded rows.

Accumulation: f32 scratch across the 3 depth taps (one rounding to bf16 at
the end - same class as XLA's conv, tighter than v1's per-tap bf16).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _pick_h_tile(h: int, wd: int, c: int, bytes_budget: int = 1 << 20) -> int:
    """Largest divisor-of-h tile with the bf16 patch matrix
    ((Ht+2)*W, 3C) inside the budget."""
    per_row = wd * 3 * c * 2
    ht = max(1, bytes_budget // per_row - 2)
    ht = min(ht, h)
    while h % ht:
        ht -= 1
    return max(ht, 1)


def _fused_kernel(x_ref, w2_ref, a_ref, b_ref, out_ref, psum_ref,
                  psumsq_ref, pad_ref, acc_ref, *, slope: float,
                  in_affine_act: bool):
    d = pl.program_id(1)
    n_d = pl.num_programs(1)
    k = pl.program_id(2)
    h, wd, c = x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    co = out_ref.shape[4]
    ht = _pick_h_tile(h, wd, c)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = jnp.logical_not(
        jnp.logical_or(jnp.logical_and(k == 0, d == 0),
                       jnp.logical_and(k == 2, d == n_d - 1)))

    @pl.when(valid)
    def _():
        pad_ref[:] = jnp.zeros_like(pad_ref)
        plane = x_ref[0, 0]
        if in_affine_act:
            # previous stage's BN-apply + LeakyReLU, fused into the stage
            # of the input plane (f32 math, one rounding to the conv dtype)
            xf = plane.astype(jnp.float32) * a_ref[0] + b_ref[0]
            xf = jnp.where(xf >= 0, xf, slope * xf)
            plane = xf.astype(pad_ref.dtype)
        pad_ref[1:h + 1, 1:wd + 1, :] = plane

        def tile_body(ti, carry):
            h0 = pl.multiple_of(ti * ht, ht)
            # patches for padded rows [h0, h0+ht+2): (ht+2, W, 3C)
            cols = [pad_ref[pl.ds(h0, ht + 2), kw:kw + wd, :]
                    for kw in range(3)]
            patches = jnp.concatenate(cols, axis=-1).reshape(
                (ht + 2) * wd, 3 * c)
            # one (M', 3C) x (3C, 3Co) pass: kh stacked into output columns
            yp = jnp.dot(patches, w2_ref[0],
                         preferred_element_type=jnp.float32)
            yp = yp.reshape(ht + 2, wd, 3, co)
            contrib = yp[0:ht, :, 0] + yp[1:ht + 1, :, 1] + yp[2:ht + 2, :, 2]
            acc_ref[pl.ds(h0, ht), :, :] += contrib
            return carry

        jax.lax.fori_loop(0, h // ht, tile_body, 0)

    @pl.when(k == 2)
    def _():
        y = acc_ref[:].astype(out_ref.dtype)
        out_ref[0, 0] = y
        # BN-stat partials of the ROUNDED output (matches XLA, which
        # reduces the stored bf16 conv output in f32)
        yf = y.astype(jnp.float32)
        psum_ref[0, 0, 0] = jnp.sum(yf, axis=(0, 1))
        psumsq_ref[0, 0, 0] = jnp.sum(yf * yf, axis=(0, 1))


def conv3d_fused_stats(
    x: Array,
    w: Array,
    in_a: Optional[Array] = None,
    in_b: Optional[Array] = None,
    slope: float = 0.01,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Fused stage forward. x (B,D,H,W,C), w (3,3,3,C,Co) DHWIO.

    Returns (y (B,D,H,W,Co) in x.dtype,
             psum (B,D,Co) f32, psumsq (B,D,Co) f32) where
    y = conv3d_same(g(x), w) with g = identity, or
    g(x) = leaky_relu(x*in_a + in_b) when in_a/in_b (per-channel f32
    vectors: the previous BN folded to an affine) are given; psum/psumsq
    are per-(b,d) partials of y and y^2 - reduce over (B,D) and divide by
    B*D*H*W for the BN batch stats.
    """
    b, d, h, wd, c = x.shape
    co = w.shape[-1]
    in_affine_act = in_a is not None
    if not in_affine_act:
        in_a = jnp.ones((c,), jnp.float32)
        in_b = jnp.zeros((c,), jnp.float32)
    # W2[k][kw*C+c, kh*Co+co] = w[k, kh, kw, c, co]
    w2 = w.astype(x.dtype).transpose(0, 2, 3, 1, 4).reshape(3, 3 * c, 3 * co)
    kernel = functools.partial(_fused_kernel, slope=slope,
                               in_affine_act=in_affine_act)
    out = pl.pallas_call(
        kernel,
        grid=(b, d, 3),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, wd, c),
                lambda bi, di, ki: (
                    bi, jnp.clip(di + ki - 1, 0, d - 1), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3 * c, 3 * co),
                lambda bi, di, ki: (ki, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c), lambda bi, di, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, di, ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, h, wd, co),
                lambda bi, di, ki: (bi, di, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Stats partials carry a unit sublane axis so the block's last
            # two dims (1, co) EQUAL the overall array's — Mosaic requires
            # last-two block dims divisible by (8, 128) or full-dim.
            # A (1, 1, co) block over a (b, d, co) array has sublane block
            # 1 vs overall d and fails to lower on real TPU.
            pl.BlockSpec((1, 1, 1, co), lambda bi, di, ki: (bi, di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, co), lambda bi, di, ki: (bi, di, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d, h, wd, co), x.dtype),
            jax.ShapeDtypeStruct((b, d, 1, co), jnp.float32),
            jax.ShapeDtypeStruct((b, d, 1, co), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((h, wd, co), jnp.float32),
        ],
        interpret=interpret,
    )(x, w2, in_a.astype(jnp.float32).reshape(1, c),
      in_b.astype(jnp.float32).reshape(1, c))
    y, s1, s2 = out
    return y, s1.reshape(b, d, co), s2.reshape(b, d, co)


def conv3d_v2(x: Array, w: Array, interpret: bool = False) -> Array:
    """Plain conv through the v2 (kh-in-N) matmul structure - for A/B
    against XLA's conv and kernels/conv3d.py's v1."""
    y, _, _ = conv3d_fused_stats(x, w, interpret=interpret)
    return y


# ---------------------------------------------------------------------------
# Differentiable conv+stats op (the integration form: BN consumes the
# fused partials instead of re-reading y from HBM; the activation stays an
# XLA elementwise fusion on the default-layout Pallas output).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_stats(x: Array, w: Array, interpret: bool = False,
                 tag: Optional[str] = None):
    """y, psum, psumsq = conv3d_stats(x, w): differentiable fused
    conv + BN-stat partials. s1 = sum_{h,w} y, s2 = sum_{h,w} y^2 per
    (b, d, co); cotangents flow through all three outputs:
      dy_total = gy + gs1 + 2*y*gs2   (broadcast over H, W)
      dx = conv(dy_total, flip(w)^T)  (the v2 Pallas kernel again)
      dw = correlation(x, dy_total)   (huge-K contraction, XLA)

    `tag` applies jax.ad_checkpoint.checkpoint_name to y INSIDE the
    custom VJP, so the VJP residual IS the tagged value: a conv_outs-style
    remat policy that saves the tag spares the backward from re-running
    the forward kernel. Tagging outside would tag a copy the residual
    doesn't alias at the jaxpr level.
    """
    y, s1, s2 = conv3d_fused_stats(x, w, interpret=interpret)
    if tag is not None:
        from jax.ad_checkpoint import checkpoint_name

        y = checkpoint_name(y, tag)
    return y, s1, s2


def _stats_fwd(x, w, interpret, tag):
    y, s1, s2 = conv3d_fused_stats(x, w, interpret=interpret)
    if tag is not None:
        from jax.ad_checkpoint import checkpoint_name

        y = checkpoint_name(y, tag)
    return (y, s1, s2), (x, w, y)


def _stats_bwd(interpret, tag, res, cots):
    x, w, y = res
    gy, gs1, gs2 = cots
    dy = (gy.astype(jnp.float32)
          + gs1[:, :, None, None, :]
          + 2.0 * y.astype(jnp.float32) * gs2[:, :, None, None, :])
    dy = dy.astype(x.dtype)
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx, _, _ = conv3d_fused_stats(dy, w_flip.astype(x.dtype),
                                  interpret=interpret)
    dw = jax.lax.conv_general_dilated(
        x.transpose(4, 1, 2, 3, 0),        # (Ci, D, H, W, B)
        dy.transpose(1, 2, 3, 0, 4),       # (D, H, W, B, Co)
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 3, 0, 4).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv3d_stats.defvjp(_stats_fwd, _stats_bwd)
