"""Pallas TPU kernel: 3x3x3 SAME stride-1 3D convolution (NDHWC).

Why: the framework's FLOPs live in 3^3 convs at 64 output channels
(e.g. (8, 80, 96, 80, 64) -> 64). XLA's conv achieves ~50 TF/s on that
shape on v5e because each implicit matmul has K = N = 64 (quarter MXU
utilization). This kernel restructures the conv as ONE implicit-GEMM per
(batch, depth) program: build the (H*W, 9*C_in) patch matrix per depth tap
in VMEM and hit the MXU with K = 9*C_in (576 for C=64) — the K dimension is
fully fed and the ceiling roughly doubles.

Structure:
- grid (B, D); each program emits one (H, W, C_out) output plane;
- the three needed depth planes arrive as three views of the same input
  with clamped index maps; out-of-range depth taps are zeroed in-kernel;
- per depth tap, a zero-padded (H+2, W+2, C) plane lives in VMEM scratch;
  9 shifted (H, W, C) slices concatenate into the patch matrix;
- fp32 accumulation via preferred_element_type, cast on write.

Backward: dgrad (3x3x3 SAME conv of the cotangent with spatially-flipped,
IO-transposed weights) reuses this same kernel; wgrad is a huge-K
contraction XLA already does well, expressed via lax.conv_general_dilated
with the batch dim playing the feature role.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _pick_h_tile(h: int, wd: int, c: int, bytes_budget: int = 1 << 20) -> int:
    """Largest divisor H tile keeping the per-kh patch matrix (Ht*W, 3C)
    under ~1MB VMEM."""
    ht = max(8, bytes_budget // max(1, wd * 3 * c * 2))
    ht = min(ht, h)
    while h % ht:
        ht -= 1
    return max(ht, 1)


def _conv_plane_kernel(xp_ref, xc_ref, xn_ref, w_ref, out_ref, pad_ref):
    """One (b, d) program: out[H, W, Co] = sum_kd conv2d(plane_kd, w[kd]).

    The padded plane per depth tap sits in VMEM scratch; the implicit-GEMM
    runs over H tiles so the (Ht*W, 9*C) patch matrix stays VMEM-resident.
    """
    d = pl.program_id(1)
    n_d = pl.num_programs(1)
    h, wd, c = xc_ref.shape[2], xc_ref.shape[3], xc_ref.shape[4]
    co = out_ref.shape[4]
    ht = _pick_h_tile(h, wd, c)

    for ti in range(h // ht):
        h0 = ti * ht
        acc = jnp.zeros((ht * wd, co), jnp.float32)
        for ref, kd in ((xp_ref, 0), (xc_ref, 1), (xn_ref, 2)):
            if ti == 0:  # fill the padded plane once per depth tap
                plane = ref[0, 0]
                if kd == 0:
                    plane = jnp.where(d > 0, plane, jnp.zeros_like(plane))
                elif kd == 2:
                    plane = jnp.where(d < n_d - 1, plane, jnp.zeros_like(plane))
                pad_ref[kd, :, :, :] = jnp.zeros_like(pad_ref[kd])
                pad_ref[kd, 1:h + 1, 1:wd + 1, :] = plane
            # one K=3C matmul per kh row keeps the patch buffer ~1MB
            for kh in range(3):
                cols = [
                    pad_ref[kd, h0 + kh:h0 + kh + ht, kw:kw + wd, :].reshape(ht * wd, c)
                    for kw in range(3)
                ]
                patches = jnp.concatenate(cols, axis=1)
                wk = w_ref[kd, kh].reshape(3 * c, co)
                acc = acc + jnp.dot(patches, wk, preferred_element_type=jnp.float32)
        out_ref[0, 0, h0:h0 + ht, :, :] = acc.reshape(ht, wd, co).astype(out_ref.dtype)


def _conv3d_impl(x: Array, w: Array, *, interpret: bool = False) -> Array:
    b, d, h, wd, c = x.shape
    co = w.shape[-1]

    def make_spec(depth_index):
        return pl.BlockSpec(
            (1, 1, h, wd, c),
            lambda bi, di: (bi, depth_index(di), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    specs = [
        make_spec(lambda di: jnp.maximum(di - 1, 0)),
        make_spec(lambda di: di),
        make_spec(lambda di: jnp.minimum(di + 1, d - 1)),
        pl.BlockSpec(w.shape, lambda bi, di: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _conv_plane_kernel,
        grid=(b, d),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1, h, wd, co),
                               lambda bi, di: (bi, di, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((3, h + 2, wd + 2, c), x.dtype)],
        interpret=interpret,
    )(x, x, x, w)


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
