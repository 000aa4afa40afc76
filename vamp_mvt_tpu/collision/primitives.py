"""Signed collision values for sphere-vs-primitive tests, batched and dense.

Each function returns a signed squared-distance-like value; collision iff the
value is strictly negative, matching the reference's sign-bit test
(src/impl/vamp/collision/validity.hh `test_zero`, vector/avx.hh:386
`_mm256_testz_ps`).  Formulas mirror src/impl/vamp/collision/sphere_*.hh.

Conventions: environment shape arrays are UNBATCHED here — (N, fields), see
collision/environment.py; query spheres are centers (..., S, 3) and radii
broadcastable to (..., S), with any batch prefix (numpy left-padding handles
the alignment).  Batching over problems/environments is done with jax.vmap at
the planner level.  Outputs are (..., S, N) signed values for N shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def sphere_sphere(spheres: jnp.ndarray, p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(..., Ns, 4) x (..., S, 3) -> (..., S, Ns). Reference sphere_sphere.hh:10-23."""
    c = spheres[..., None, :, :3]  # (..., 1, Ns, 3)
    cr = spheres[..., None, :, 3]
    d2 = jnp.sum((p[..., :, None, :] - c) ** 2, axis=-1)
    rs = r[..., :, None] + cr
    return d2 - rs * rs


def sphere_capsule(capsules: jnp.ndarray, p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(..., Nc, 8) x (..., S, 3) -> (..., S, Nc). Reference sphere_capsule.hh:8-23."""
    c = capsules[..., None, :, :]  # (..., 1, Nc, 8)
    px, py, pz = p[..., :, None, 0], p[..., :, None, 1], p[..., :, None, 2]
    dot = _dot3(
        px - c[..., 0], py - c[..., 1], pz - c[..., 2], c[..., 3], c[..., 4], c[..., 5]
    )
    t = jnp.clip(dot * c[..., 7], 0.0, 1.0)
    d2 = (
        (px - (c[..., 0] + c[..., 3] * t)) ** 2
        + (py - (c[..., 1] + c[..., 4] * t)) ** 2
        + (pz - (c[..., 2] + c[..., 5] * t)) ** 2
    )
    rs = r[..., :, None] + c[..., 6]
    return d2 - rs * rs


def sphere_z_capsule(capsules: jnp.ndarray, p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Z-aligned specialization (reference sphere_capsule.hh:31-47)."""
    c = capsules[..., None, :, :]
    px, py, pz = p[..., :, None, 0], p[..., :, None, 1], p[..., :, None, 2]
    t = jnp.clip((pz - c[..., 2]) * c[..., 5] * c[..., 7], 0.0, 1.0)
    d2 = (
        (px - c[..., 0]) ** 2
        + (py - c[..., 1]) ** 2
        + (pz - (c[..., 2] + c[..., 5] * t)) ** 2
    )
    rs = r[..., :, None] + c[..., 6]
    return d2 - rs * rs


def sphere_cuboid(cuboids: jnp.ndarray, p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(..., Nb, 15) x (..., S, 3) -> (..., S, Nb). Reference sphere_cuboid.hh:8-27."""
    c = cuboids[..., None, :, :]
    xs = p[..., :, None, 0] - c[..., 0]
    ys = p[..., :, None, 1] - c[..., 1]
    zs = p[..., :, None, 2] - c[..., 2]
    a1 = jnp.maximum(
        jnp.abs(_dot3(c[..., 3], c[..., 4], c[..., 5], xs, ys, zs)) - c[..., 12], 0.0
    )
    a2 = jnp.maximum(
        jnp.abs(_dot3(c[..., 6], c[..., 7], c[..., 8], xs, ys, zs)) - c[..., 13], 0.0
    )
    a3 = jnp.maximum(
        jnp.abs(_dot3(c[..., 9], c[..., 10], c[..., 11], xs, ys, zs)) - c[..., 14], 0.0
    )
    return a1 * a1 + a2 * a2 + a3 * a3 - r[..., :, None] ** 2


def sphere_z_cuboid(cuboids: jnp.ndarray, p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Z-aligned specialization (reference sphere_cuboid.hh:35-52)."""
    c = cuboids[..., None, :, :]
    xs = p[..., :, None, 0] - c[..., 0]
    ys = p[..., :, None, 1] - c[..., 1]
    zs = p[..., :, None, 2] - c[..., 2]
    a1 = jnp.maximum(
        jnp.abs(c[..., 3] * xs + c[..., 4] * ys) - c[..., 12], 0.0
    )
    a2 = jnp.maximum(
        jnp.abs(c[..., 6] * xs + c[..., 7] * ys) - c[..., 13], 0.0
    )
    a3 = jnp.maximum(jnp.abs(zs) - c[..., 14], 0.0)
    return a1 * a1 + a2 * a2 + a3 * a3 - r[..., :, None] ** 2


def sphere_heightfield(
    hf_meta: jnp.ndarray, hf_data: jnp.ndarray, p: jnp.ndarray, r: jnp.ndarray
) -> jnp.ndarray:
    """(..., Nh, 10)+(..., Nh, C) x (..., S, 3) -> (..., S, Nh).

    Reference sphere_heightfield.hh:8-30: map world xy to a grid cell, gather
    the height, compare against sphere bottom.
    """
    m = hf_meta[..., None, :, :]  # (..., 1, Nh, 10)
    xo = m[..., 0] - p[..., :, None, 0]
    yo = m[..., 1] - p[..., :, None, 1]
    cx = jnp.floor(jnp.clip(m[..., 3] * xo + m[..., 8], 0.0, m[..., 6]))
    cy = jnp.floor(jnp.clip(m[..., 4] * yo + m[..., 9], 0.0, m[..., 7]))
    idx = (cy * m[..., 6] + cx).astype(jnp.int32)
    idx = jnp.clip(idx, 0, hf_data.shape[-1] - 1)
    zh = _gather_heights(hf_data, idx)
    zhs = m[..., 5] * zh + m[..., 2]
    return p[..., :, None, 2] - r[..., :, None] - zhs


def _gather_heights(hf_data: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """hf_data (Nh, C), idx (..., S, Nh) int -> (..., S, Nh).

    Unrolled over the (small, static) heightfield count.
    """
    nh = hf_data.shape[-2]
    cols = [jnp.take(hf_data[n], idx[..., n], axis=0) for n in range(nh)]
    return jnp.stack(cols, axis=-1)
