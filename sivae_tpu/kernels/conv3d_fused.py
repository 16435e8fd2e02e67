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


def _pick_h_tile(h: int, wd: int, c: int, bytes_budget: int = 1 << 19) -> int:
    """Largest divisor-of-h tile with the bf16 patch matrix
    ((Ht+2)*W, 3C) inside the budget."""
    per_row = wd * 3 * c * 2
    ht = max(1, bytes_budget // per_row - 2)
    ht = min(ht, h)
    while h % ht:
        ht -= 1
    return max(ht, 1)


def _lanes(n: int) -> int:
    return ((n + 127) // 128) * 128


def _pick_hb(h: int, wd: int, c: int, co: int,
             budget: int = 12 << 20) -> int:
    """Largest divisor-of-h H-block keeping the kernel's VMEM working set
    under budget. Lane dims pad to 128 on hardware (C=64 arrays allocate
    2x), which is what OOMed the 16M scoped-vmem limit when the whole
    plane was one block: full-plane x + out + f32 acc + patch matrix
    = ~15.8M padded. Only x needs full-plane residency (halo rows); out,
    acc and the patch matrix shrink with the H-block."""
    fixed = (2 * 2 * h * wd * _lanes(c)            # x block, 2 buffers
             + 2 * 2 * 3 * c * _lanes(3 * co))     # w2 block, 2 buffers
    hb = h
    while hb > 1:
        var = (2 * 2 * hb * wd * _lanes(co)        # out block, 2 buffers
               + 2 * (hb + 2) * wd * _lanes(3 * c)  # bf16 patch scratch
               + 4 * hb * wd * _lanes(co))         # f32 acc scratch
        if fixed + var <= budget:
            break
        hb -= 1
        while h % hb:
            hb -= 1
    return hb


def _fused_kernel(x_ref, w2_ref, a_ref, b_ref, out_ref, psum_ref,
                  psumsq_ref, patch_ref, acc_ref, *, slope: float,
                  in_affine_act: bool):
    d = pl.program_id(1)
    n_d = pl.num_programs(1)
    hi = pl.program_id(2)
    k = pl.program_id(3)
    h, wd, c = x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    hb = out_ref.shape[2]
    co = out_ref.shape[4]
    ht = _pick_h_tile(hb, wd, c)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = jnp.logical_not(
        jnp.logical_or(jnp.logical_and(k == 0, d == 0),
                       jnp.logical_and(k == 2, d == n_d - 1)))

    @pl.when(valid)
    def _():
        # Build the padded patch matrix for this H-block:
        # P[r, w, kw*C+c] = pad[hi*hb + r, w+kw, c], padded rows
        # [hi*hb, hi*hb + hb + 2) of the plane. Three kw-shifted
        # lane-offset stores per strip — Mosaic cannot lower a lane-dim
        # concat of offset-mismatched slices inside the tile loop, and
        # staging once removes the per-tile rebuild of overlapping rows.
        # Strip-wise staging bounds the live vector values (bf16 strip +
        # f32 affine intermediates) to ~hs*W*C*10 bytes.
        h0x = hi * hb  # x row of this block's first interior patch row

        # w-border zeros for all hb+2 rows (staging leaves those columns)
        patch_ref[:, 0:1, 0:c] = jnp.zeros(
            (hb + 2, 1, c), patch_ref.dtype)
        patch_ref[:, wd - 1:wd, 2 * c:3 * c] = jnp.zeros(
            (hb + 2, 1, c), patch_ref.dtype)

        def stage_rows(dst0, src0, nrows):
            strip = x_ref[0, 0, pl.ds(src0, nrows)]
            if in_affine_act:
                # previous stage's BN-apply + LeakyReLU, fused into the
                # stage of the input plane (f32 math, one rounding to the
                # conv dtype)
                xf = strip.astype(jnp.float32) * a_ref[0] + b_ref[0]
                xf = jnp.where(xf >= 0, xf, slope * xf)
                strip = xf.astype(patch_ref.dtype)
            patch_ref[pl.ds(dst0, nrows), 1:wd, 0:c] = strip[:, 0:wd - 1, :]
            patch_ref[pl.ds(dst0, nrows), :, c:2 * c] = strip
            patch_ref[pl.ds(dst0, nrows), 0:wd - 1, 2 * c:3 * c] = strip[
                :, 1:wd, :]

        hs = min(8, hb)
        while hb % hs:
            hs -= 1

        def stage_body(si, carry):
            s0 = pl.multiple_of(si * hs, hs)
            stage_rows(s0 + 1, h0x + s0, hs)
            return carry

        jax.lax.fori_loop(0, hb // hs, stage_body, 0)

        # H halos: row 0 <- x row h0x-1, row hb+1 <- x row h0x+hb
        # (zero at the plane borders)
        @pl.when(hi == 0)
        def _():
            patch_ref[0:1] = jnp.zeros_like(patch_ref[0:1])

        @pl.when(hi > 0)
        def _():
            stage_rows(0, h0x - 1, 1)

        @pl.when(hi == pl.num_programs(2) - 1)
        def _():
            patch_ref[hb + 1:hb + 2] = jnp.zeros_like(
                patch_ref[hb + 1:hb + 2])

        @pl.when(hi < pl.num_programs(2) - 1)
        def _():
            stage_rows(hb + 1, h0x + hb, 1)

        def tile_body(ti, carry):
            h0 = pl.multiple_of(ti * ht, ht)
            patches = patch_ref[pl.ds(h0, ht + 2), :, :].reshape(
                (ht + 2) * wd, 3 * c)
            # one (M', 3C) x (3C, 3Co) pass: kh stacked into output columns
            yp = jnp.dot(patches, w2_ref[0],
                         preferred_element_type=jnp.float32)
            # Mosaic cannot shape-cast a lane-dim split ((M',3Co)->(..,3,Co)
            # fails infer-vector-layout); keep the 3Co lane dim through the
            # sublane reshape and take lane slices instead.
            yp = yp.reshape(ht + 2, wd, 3 * co)
            contrib = (yp[0:ht, :, 0:co]
                       + yp[1:ht + 1, :, co:2 * co]
                       + yp[2:ht + 2, :, 2 * co:3 * co])
            acc_ref[pl.ds(h0, ht), :, :] += contrib
            return carry

        jax.lax.fori_loop(0, hb // ht, tile_body, 0)

    @pl.when(k == 2)
    def _():
        y = acc_ref[:].astype(out_ref.dtype)
        out_ref[0, 0] = y
        # BN-stat partials of the ROUNDED output (matches XLA, which
        # reduces the stored bf16 conv output in f32), accumulated across
        # the H-blocks (the psum block index ignores hi, so the block
        # stays resident for the whole (b, d) plane).
        # 2-D (1, co) stores: rank-1 vector stores are the least-robust
        # shape for Mosaic lowering (ADVICE r4)
        yf = y.astype(jnp.float32).reshape(hb * wd, co)
        s1 = jnp.sum(yf, axis=0, keepdims=True)
        s2 = jnp.sum(yf * yf, axis=0, keepdims=True)

        @pl.when(hi == 0)
        def _():
            psum_ref[0, 0] = s1
            psumsq_ref[0, 0] = s2

        @pl.when(hi > 0)
        def _():
            psum_ref[0, 0] += s1
            psumsq_ref[0, 0] += s2


def conv3d_fused_stats(
    x: Array,
    w: Array,
    in_a: Optional[Array] = None,
    in_b: Optional[Array] = None,
    slope: float = 0.01,
    interpret: bool = False,
    h_block: Optional[int] = None,
) -> Tuple[Array, Array, Array]:
    """Fused stage forward. x (B,D,H,W,C), w (3,3,3,C,Co) DHWIO.
    `h_block` overrides the VMEM-budgeted H-block size (tests use it to
    exercise the multi-H-block path on shapes small enough to fit whole).

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
    hb = h_block if h_block is not None else _pick_hb(h, wd, c, co)
    assert h % hb == 0, (h, hb)
    out = pl.pallas_call(
        kernel,
        grid=(b, d, h // hb, 3),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, wd, c),
                lambda bi, di, hi, ki: (
                    bi, jnp.clip(di + ki - 1, 0, d - 1), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3 * c, 3 * co),
                lambda bi, di, hi, ki: (ki, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c), lambda bi, di, hi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, di, hi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, hb, wd, co),
                lambda bi, di, hi, ki: (bi, di, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Stats partials carry a unit sublane axis so the block's last
            # two dims (1, co) EQUAL the overall array's — Mosaic requires
            # last-two block dims divisible by (8, 128) or full-dim.
            # A (1, 1, co) block over a (b, d, co) array has sublane block
            # 1 vs overall d and fails to lower on real TPU.
            pl.BlockSpec((1, 1, 1, co),
                         lambda bi, di, hi, ki: (bi, di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, co),
                         lambda bi, di, hi, ki: (bi, di, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d, h, wd, co), x.dtype),
            jax.ShapeDtypeStruct((b, d, 1, co), jnp.float32),
            jax.ShapeDtypeStruct((b, d, 1, co), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb + 2, wd, 3 * c), x.dtype),
            pltpu.VMEM((hb, wd, co), jnp.float32),
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
