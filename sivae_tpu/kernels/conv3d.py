"""Pallas TPU kernel: 3x3x3 SAME stride-1 3D convolution (NDHWC).

Why: the framework's FLOPs live in 3^3 convs at 64 output channels
(e.g. (8, 80, 96, 80, 64) -> 64). XLA's conv achieves ~50 TF/s on that
shape on v5e because each implicit matmul has K = N = 64 (quarter MXU
utilization). This kernel restructures the conv as implicit GEMM with
K = 3*C_in per (kh) row — the MXU contraction dimension is fully fed.

Structure (VMEM-frugal: one input plane in flight):
- grid (B, D, 3), depth-tap k fastest; the single input view's index map is
  clamp(d + k - 1) so each program sees exactly the plane it needs;
- an f32 accumulator scratch (H, W, Co) persists across the 3 k-steps
  (TPU grid execution is sequential); the output block's index map is
  constant in k so it is written back once after the last tap;
- per tap, a zero-padded (H+2, W+2, C) plane in scratch provides the 9
  shifted views; H is tiled so each (Ht*W, 3C) patch matrix stays ~1MB;
- out-of-range depth taps (d=0 k=0, d=D-1 k=2) are skipped via pl.when.

Backward: dgrad (conv of the cotangent with spatially-flipped,
IO-transposed weights) reuses this kernel; wgrad is a huge-K contraction
XLA already does well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _pick_h_tile(h: int, wd: int, c: int, bytes_budget: int = 1 << 20) -> int:
    """Largest divisor H tile keeping the (Ht*W, 3C) patch matrix ~<=1MB."""
    ht = max(1, bytes_budget // max(1, wd * 3 * c * 2))
    ht = min(ht, h)
    while h % ht:
        ht -= 1
    return max(ht, 1)


def _conv_tap_kernel(x_ref, w_ref, out_ref, pad_ref, acc_ref):
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
        pad_ref[1:h + 1, 1:wd + 1, :] = x_ref[0, 0]

        def tile_body(ti, carry):
            h0 = pl.multiple_of(ti * ht, ht)
            # fp32 accumulation within each tap (K=3C dot); the running
            # cross-tap sum is held in the activation dtype (bf16 when the
            # model computes in bf16) — same precision class as every other
            # stored activation, and it keeps the scratch inside VMEM
            acc = acc_ref[pl.ds(h0, ht), :, :].reshape(ht * wd, co).astype(jnp.float32)
            for kh in range(3):  # static 3-tap unroll, buffers reused per tile
                cols = [
                    pad_ref[pl.ds(h0 + kh, ht), kw:kw + wd, :].reshape(ht * wd, c)
                    for kw in range(3)
                ]
                patches = jnp.concatenate(cols, axis=1)
                wk = w_ref[0, kh].reshape(3 * c, co)
                acc = acc + jnp.dot(patches, wk, preferred_element_type=jnp.float32)
            acc_ref[pl.ds(h0, ht), :, :] = acc.reshape(ht, wd, co).astype(acc_ref.dtype)
            return carry

        jax.lax.fori_loop(0, h // ht, tile_body, 0)

    @pl.when(k == 2)
    def _():
        out_ref[0, 0] = acc_ref[:].astype(out_ref.dtype)


def _conv3d_impl(x: Array, w: Array, *, interpret: bool = False) -> Array:
    b, d, h, wd, c = x.shape
    co = w.shape[-1]
    return pl.pallas_call(
        _conv_tap_kernel,
        grid=(b, d, 3),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, wd, c),
                lambda bi, di, ki: (
                    bi, jnp.clip(di + ki - 1, 0, d - 1), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 3, c, co),
                lambda bi, di, ki: (ki, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, wd, co),
            lambda bi, di, ki: (bi, di, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((h, wd, co), x.dtype),
        ],
        interpret=interpret,
    )(x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_same_pallas(x: Array, w: Array, interpret: bool = False) -> Array:
    """3x3x3 SAME stride-1 conv, NDHWC x DHWIO -> NDHWC (differentiable)."""
    return _conv3d_impl(x, w, interpret=interpret)


def _fwd(x, w, interpret):
    return _conv3d_impl(x, w, interpret=interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    # dgrad: conv of g with spatially flipped, IO-swapped weights
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv3d_impl(g.astype(x.dtype), w_flip.astype(x.dtype),
                      interpret=interpret)
    # wgrad: correlation of x with g over (B, D, H, W)
    dw = jax.lax.conv_general_dilated(
        x.transpose(4, 1, 2, 3, 0),        # (Ci, D, H, W, B)
        g.transpose(1, 2, 3, 0, 4),        # (D, H, W, B, Co)
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 3, 0, 4).astype(w.dtype)  # (3,3,3,Ci,Co)
    return dx.astype(x.dtype), dw


conv3d_same_pallas.defvjp(
    lambda x, w, interpret: _fwd(x, w, interpret),
    _bwd,
)
