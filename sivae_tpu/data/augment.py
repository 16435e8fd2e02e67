"""On-device 3D augmentation: random affine (rotation+scale) and noise.

The reference augments per item on host CPU via TorchIO inside DataLoader
workers — its main input-pipeline bottleneck (SURVEY §3.2):
- RandomAffine(degrees=15) w/ OneOf p=0.6 (reference 600z_main.py:115-135)
- RandomAffine(degrees=10) w/ OneOf p=0.35 (aug-z-1200main.py:106-119)
- RandomNoise(mean=0.03, std=0.03) w/ p=0.5 (vae_main.py:130-139)

Here augmentation is a jitted, vmapped device function: trilinear resampling
of the whole batch on TPU, composable into the train step. Rotation angles
are sampled U(-deg, +deg) per axis, scales U(lo, hi) per axis (TorchIO's
default scale jitter 0.1 reproduced), fill value 0, linear interpolation.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _rotation_matrix(angles: Array) -> Array:
    """Rotation R = Rz @ Ry @ Rx for angles (radians) about the 3 axes."""
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _affine_resample(vol: Array, matrix: Array,
                     translation: Array | None = None) -> Array:
    """Resample vol (D, H, W) through the inverse affine `matrix` (3x3),
    rotating/scaling about the volume center, trilinear, zero fill.

    `translation` is the FORWARD shift t (voxels): output(x) = input at
    matrix @ (x - center - t) + center. Golden-tested against
    scipy.ndimage.affine_transform in tests/test_data.py."""
    d, h, w = vol.shape
    center = jnp.array([(d - 1) / 2.0, (h - 1) / 2.0, (w - 1) / 2.0])
    shift = center if translation is None else center + translation
    grid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(d, dtype=jnp.float32),
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=0,
    ).reshape(3, -1)
    src = matrix @ (grid - shift[:, None]) + center[:, None]
    out = jax.scipy.ndimage.map_coordinates(vol, list(src), order=1, mode="constant", cval=0.0)
    return out.reshape(d, h, w)


def _augment_one(vol: Array, key: jax.Array, degrees: float,
                 scale_jitter: float, p: float, translate: float) -> Array:
    # NB: split(key, 4) (was 3 before translation support, round 3) changes
    # the k_apply/k_ang/k_scale streams even at translate=0 — seeded
    # augmented runs are not draw-for-draw reproducible across that commit
    # boundary (statistics are unchanged; only the sampled draws moved)
    k_apply, k_ang, k_scale, k_tr = jax.random.split(key, 4)
    angles = jax.random.uniform(
        k_ang, (3,), minval=-degrees, maxval=degrees) * (jnp.pi / 180.0)
    scales = 1.0 + jax.random.uniform(
        k_scale, (3,), minval=-scale_jitter, maxval=scale_jitter)
    rot = _rotation_matrix(angles)
    # inverse map: output coords -> input coords = R^-1 @ S^-1 (R orthonormal)
    inv = rot.T * (1.0 / scales)[None, :]
    translation = (jax.random.uniform(k_tr, (3,), minval=-translate,
                                      maxval=translate)
                   if translate > 0 else None)
    resampled = _affine_resample(vol, inv, translation)
    apply = jax.random.uniform(k_apply) < p
    return jnp.where(apply, resampled, vol)


@functools.partial(jax.jit,
                   static_argnames=("degrees", "scale_jitter", "p", "translate"))
def random_affine_batch(
    rng: jax.Array,
    voxels: Array,
    degrees: float = 15.0,
    scale_jitter: float = 0.1,
    p: float = 0.6,
    translate: float = 0.0,
) -> Array:
    """Batch random affine. voxels: (B, D, H, W) or (B, D, H, W, 1).

    translate > 0 adds a per-axis U(-translate, +translate) voxel shift
    (TorchIO RandomAffine's `translation` option; the reference entry
    scripts leave it at the 0 default, 600z_main.py:115-135)."""
    squeeze = voxels.ndim == 5
    v = voxels[..., 0] if squeeze else voxels
    keys = jax.random.split(rng, v.shape[0])
    out = jax.vmap(
        lambda x, k: _augment_one(x, k, degrees, scale_jitter, p, translate)
    )(v, keys)
    return out[..., None] if squeeze else out


@functools.partial(jax.jit, static_argnames=("mean", "std", "p"))
def random_noise_batch(
    rng: jax.Array,
    voxels: Array,
    mean: float = 0.03,
    std: float = 0.03,
    p: float = 0.5,
) -> Array:
    """Additive Gaussian noise per volume with probability p
    (TorchIO RandomNoise parity, vae_main.py:130-139)."""
    k_apply, k_noise = jax.random.split(rng)
    noise = mean + std * jax.random.normal(k_noise, voxels.shape, jnp.float32)
    apply = jax.random.uniform(k_apply, (voxels.shape[0],) + (1,) * (voxels.ndim - 1)) < p
    return jnp.where(apply, voxels + noise, voxels)
