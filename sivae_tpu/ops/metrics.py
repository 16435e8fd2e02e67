"""Image quality metrics: RMSE, PSNR, SSIM (2D slices and 3D volumes).

The reference uses skimage's mean_squared_error / structural_similarity on
center slices for its recon panels (utils/my_trainer.py:92-127) and
testshow.ipynb. skimage is not a dependency here; SSIM is implemented to its
default semantics (7x7 uniform window, K1=0.01, K2=0.03) in jax so it can
run on device over whole batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def rmse(a: Array, b: Array) -> Array:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.sqrt(jnp.mean((a - b) ** 2))


def psnr(a: Array, b: Array, data_range: float = 1.0) -> Array:
    mse = jnp.mean((jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _separable_mean(x: Array, win: int) -> Array:
    """Separable uniform mean filter via cumulative sums ('valid' output)."""
    out = x
    for axis in range(x.ndim):
        n = out.shape[axis]
        if n < win:
            raise ValueError(f"window {win} larger than axis {axis} ({n})")
        c = jnp.cumsum(out, axis=axis)
        zshape = list(c.shape)
        zshape[axis] = 1
        cpad = jnp.concatenate([jnp.zeros(zshape, c.dtype), c], axis=axis)
        hi = jax.lax.slice_in_dim(cpad, win, n + 1, axis=axis)
        lo = jax.lax.slice_in_dim(cpad, 0, n - win + 1, axis=axis)
        out = (hi - lo) / win
    return out


def ssim(
    a: Array,
    b: Array,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """Mean SSIM over an N-d image pair (skimage-default semantics:
    uniform window, sample covariance normalization N/(N-1))."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ndim = a.ndim
    npts = win_size**ndim
    cov_norm = npts / (npts - 1.0)

    ux = _separable_mean(a, win_size)
    uy = _separable_mean(b, win_size)
    uxx = _separable_mean(a * a, win_size)
    uyy = _separable_mean(b * b, win_size)
    uxy = _separable_mean(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * ux * uy + c1) * (2 * vxy + c2)
    den = (ux**2 + uy**2 + c1) * (vx + vy + c2)
    s = num / den
    # skimage crops (win_size-1)//2 off each side of the valid region mean;
    # the valid-region mean is equivalent here since our filter is 'valid'.
    pad = (win_size - 1) // 2
    if all(dim > 2 * pad for dim in s.shape):
        s = s[tuple(slice(pad, dim - pad) for dim in s.shape)]
    return jnp.mean(s)


def batch_ssim_center_slice(x: Array, y: Array, data_range: float = 1.0) -> np.ndarray:
    """Per-sample SSIM of the axial center slice (the reference panels use
    slice [50] of the (H, W, D)-transposed volume, my_trainer.py:100-110)."""
    x = np.asarray(x)
    y = np.asarray(y)
    if x.ndim == 5:  # NDHWC
        x, y = x[..., 0], y[..., 0]
    mid = x.shape[1] // 2
    return np.array([float(ssim(x[i, mid], y[i, mid], data_range)) for i in range(x.shape[0])])
