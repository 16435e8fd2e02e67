"""Pallas TPU kernels: 3x3x3 SAME stride-1 convs with a 1-channel side.

Why: the flagship step contains nine ~33 ms XLA conv fusions whose output
(or input) has ONE channel — the decoder's tail conv 64->1 (reference
models/models.py:136-141) run per decoder forward, and the encoder stem
conv's input-gradient 64->1 (reference models/models.py:95) needed when
phase D differentiates encode(decode(z)) through the reconstruction. An
MXU conv with N=1 output channels uses 1/128 of the systolic array; these
nine fusions were ~20% of the whole two-phase step (xplane profile,
docs/PERF.md round 3).

A conv with a 1-channel side is not a matmul — it is a 27-tap stencil with
a channel reduction (C->1) or channel broadcast (1->C). Both are VPU jobs:

- `_small_out_impl` (C->1): accumulate  acc[h,w,c] += x[h+kh-1,w+kw-1,c] *
  w[kd,kh,kw,c]  over the 27 taps (pure lane-aligned FMAs), then one
  cross-lane reduce per plane.
- `_small_in_impl` (1->C): acc[h,w,c] += x[h+kh-1,w+kw-1] * w[kd,kh,kw,c]
  (broadcast over lanes), no reduce.

Both kernels walk grid (B, D, 3) with the depth tap as the innermost grid
dimension: the input spec's index map is clamp(d + k - 1) so each program
sees exactly the one input plane it needs (same scheme as
kernels/conv3d.py); an f32 accumulator scratch persists across the 3
k-steps (TPU grid execution is sequential) and the output block is written
once at k == 2. Out-of-range depth taps are skipped via `pl.when`.

The public wrappers are `jax.custom_vjp`s wired so each direction uses the
right kernel:

    conv3d_to1   : fwd = C->1 kernel;  dx = 1->C kernel (flipped taps)
    conv3d_from1 : fwd = 1->C kernel;  dx = C->1 kernel (flipped taps)

and the weight gradient stays on XLA (a large contraction it handles
well). 1-channel tensors travel SQUEEZED (N,D,H,W) inside the kernels —
callers reshape; the squeezed<->(...,1) reshape is layout-free on TPU
(both are (8,128)-tiled over (H?,W)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Per-plane VMEM budget check: input plane + zero-padded plane + f32
# accumulator must fit (with double-buffered input blocks) in ~16 MB.
# The flagship plane (96, 80, 64) needs ~10 MB; "fullsize" (192, 160, 64)
# would need ~24 MB -> callers must fall back to XLA (see fits_vmem).
_VMEM_BUDGET = 12 * 2**20


def fits_vmem(h: int, w: int, c: int, itemsize: int = 2) -> bool:
    # the from1 kernel needs a sublane-aligned H tile; without one it would
    # degenerate to a full-plane unrolled FMA chain whose loop temporaries
    # (not modeled below) overflow the 16 MB scoped-VMEM stack — reject so
    # the caller falls back to XLA (_pick_h_tile returns 0 for "no tile")
    if _pick_h_tile(h, aligned=True) == 0:
        return False
    lanes = -(-c // 128) * 128 if c > 1 else 128
    plane = (h + 2) * (w + 2) * lanes * itemsize      # padded input scratch
    acc = h * w * lanes * 4                           # f32 accumulator
    inblk = h * w * lanes * itemsize                  # pipelined input block
    return 2 * inblk + plane + acc < _VMEM_BUDGET


def _tap_weight(w_ref, kh: int, kw: int):
    return w_ref[0, kh, kw, :].astype(jnp.float32)


def _pick_h_tile(h: int, budget_rows: int = 32, aligned: bool = False) -> int:
    """Largest divisor of h <= budget_rows — keeps per-tile f32 temporaries
    ~<=1 MB so the kernel's scoped VMEM stack stays under the 16 MB limit
    (full-plane unrolled FMA chains overflowed it at (96, 80, 64)).
    aligned=True additionally requires ht % 8 == 0 (or ht == h): the from1
    kernel's 2D pad loads start at ti*ht in the SUBLANE dim. When no
    aligned tile exists, a full plane is acceptable only if it is itself
    within the row budget; otherwise return 0 ("no usable tile" — callers
    gate on fits_vmem, which rejects such shapes before tracing)."""
    ht = min(h, budget_rows)
    while ht > 1 and (h % ht or (aligned and ht % 8 and ht != h)):
        ht -= 1
    if not aligned or ht > 1:
        return max(ht, 1)
    return h if h <= budget_rows else 0


def _small_out_kernel(x_ref, w_ref, out_ref, pad_ref, acc_ref):
    """x (1,1,H,W,C) plane -> out (1,1,H,W): 27-tap stencil, lane reduce."""
    d = pl.program_id(1)
    n_d = pl.num_programs(1)
    k = pl.program_id(2)
    h, wd = x_ref.shape[2], x_ref.shape[3]
    ht = _pick_h_tile(h)

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
        taps = [[_tap_weight(w_ref, kh, kw) for kw in range(3)]
                for kh in range(3)]

        def tile_body(ti, carry):
            h0 = pl.multiple_of(ti * ht, ht)
            acc = acc_ref[pl.ds(h0, ht), :, :]
            for kh in range(3):
                for kw in range(3):
                    sl = pad_ref[pl.ds(h0 + kh, ht), kw:kw + wd, :]
                    acc = acc + sl.astype(jnp.float32) * taps[kh][kw]
            acc_ref[pl.ds(h0, ht), :, :] = acc
            return carry

        jax.lax.fori_loop(0, h // ht, tile_body, 0)

    @pl.when(k == 2)
    def _():
        out_ref[0, 0] = jnp.sum(acc_ref[:], axis=-1).astype(out_ref.dtype)


def _small_in_kernel(x_ref, w_ref, out_ref, pad_ref, acc_ref):
    """x (1,1,H,W) plane -> out (1,1,H,W,C): stencil, lane broadcast."""
    d = pl.program_id(1)
    n_d = pl.num_programs(1)
    k = pl.program_id(2)
    h, wd = x_ref.shape[2], x_ref.shape[3]

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = jnp.logical_not(
        jnp.logical_or(jnp.logical_and(k == 0, d == 0),
                       jnp.logical_and(k == 2, d == n_d - 1)))

    @pl.when(valid)
    def _():
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[1:h + 1, 1:wd + 1] = x_ref[0, 0]
        taps = [[_tap_weight(w_ref, kh, kw) for kw in range(3)]
                for kh in range(3)]
        ht = _pick_h_tile(h, aligned=True)

        def tile_body(ti, carry):
            # the 2D pad's dim 0 IS the sublane dim: memref loads must start
            # 8-aligned, so load an aligned (ht+2)-row block once and take
            # the three +0/+1/+2 row shifts as static VALUE slices (sublane
            # rotates), which Mosaic supports at any offset.
            h0 = pl.multiple_of(ti * ht, ht)
            blk = pad_ref[pl.ds(h0, ht + 2), :].astype(jnp.float32)
            acc = acc_ref[pl.ds(h0, ht), :, :]
            for kh in range(3):
                for kw in range(3):
                    sl = jax.lax.slice(blk, (kh, kw), (kh + ht, kw + wd))
                    # f32 BEFORE the minor-dim insert: Mosaic only supports
                    # non-no-op minor-dim broadcasts for 32-bit types
                    acc = acc + sl[..., None] * taps[kh][kw]
            acc_ref[pl.ds(h0, ht), :, :] = acc
            return carry

        jax.lax.fori_loop(0, h // ht, tile_body, 0)

    @pl.when(k == 2)
    def _():
        out_ref[0, 0] = acc_ref[:].astype(out_ref.dtype)


def _small_out_impl(x: Array, w3: Array, *, interpret: bool = False) -> Array:
    """(B,D,H,W,C) x (3,3,3,C) -> (B,D,H,W)."""
    b, d, h, wd, c = x.shape
    return pl.pallas_call(
        _small_out_kernel,
        grid=(b, d, 3),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, wd, c),
                lambda bi, di, ki: (bi, jnp.clip(di + ki - 1, 0, d - 1),
                                    0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 3, c),
                lambda bi, di, ki: (ki, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, wd),
            lambda bi, di, ki: (bi, di, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((h, wd, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, w3)


def _small_in_impl(x: Array, w3: Array, *, interpret: bool = False) -> Array:
    """(B,D,H,W) x (3,3,3,C) -> (B,D,H,W,C)."""
    b, d, h, wd = x.shape
    c = w3.shape[-1]
    return pl.pallas_call(
        _small_in_kernel,
        grid=(b, d, 3),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, wd),
                lambda bi, di, ki: (bi, jnp.clip(di + ki - 1, 0, d - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 3, c),
                lambda bi, di, ki: (ki, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, wd, c),
            lambda bi, di, ki: (bi, di, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd + 2), x.dtype),
            pltpu.VMEM((h, wd, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, w3)


def _flip_taps(w3: Array) -> Array:
    return jnp.flip(w3, axis=(0, 1, 2))


def _wgrad(x5: Array, g5: Array) -> Array:
    """dW (3,3,3,ci,co) by XLA correlation over (B, D, H, W) — same
    formulation as kernels/conv3d.py:_bwd (a big-K contraction the MXU
    handles well)."""
    dw = jax.lax.conv_general_dilated(
        x5.transpose(4, 1, 2, 3, 0),        # (Ci, D, H, W, B)
        g5.transpose(1, 2, 3, 0, 4),        # (D, H, W, B, Co)
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 3, 0, 4)              # (3, 3, 3, Ci, Co)
    return dw


# ---------------------------------------------------------------------------
# conv3d_to1: (B,D,H,W,C) x (3,3,3,C,1) -> (B,D,H,W,1)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_to1(x: Array, w: Array, interpret: bool = False) -> Array:
    """3x3x3 SAME stride-1 conv to ONE output channel (differentiable)."""
    y = _small_out_impl(x, w[..., 0], interpret=interpret)
    return y[..., None]


def _to1_fwd(x, w, interpret):
    return conv3d_to1(x, w, interpret), (x, w)


def _to1_bwd(interpret, res, g):
    x, w = res
    g4 = g[..., 0]
    # dx: correlate the cotangent with tap-flipped weights, broadcast to C
    dx = _small_in_impl(g4.astype(x.dtype), _flip_taps(w[..., 0]).astype(x.dtype),
                        interpret=interpret)
    dw = _wgrad(x, g).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv3d_to1.defvjp(_to1_fwd, _to1_bwd)


# ---------------------------------------------------------------------------
# conv3d_from1: (B,D,H,W,1) x (3,3,3,1,C) -> (B,D,H,W,C)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_from1(x: Array, w: Array, interpret: bool = False) -> Array:
    """3x3x3 SAME stride-1 conv from ONE input channel (differentiable)."""
    return _small_in_impl(x[..., 0], w[:, :, :, 0, :], interpret=interpret)


def _from1_fwd(x, w, interpret):
    return conv3d_from1(x, w, interpret), (x, w)


def _from1_bwd(interpret, res, g):
    x, w = res
    dx4 = _small_out_impl(g.astype(x.dtype), _flip_taps(w[:, :, :, 0, :]).astype(x.dtype),
                          interpret=interpret)
    dw = _wgrad(x, g).astype(w.dtype)
    return dx4[..., None].astype(x.dtype), dw


conv3d_from1.defvjp(_from1_fwd, _from1_bwd)
