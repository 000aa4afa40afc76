"""MVT — Multi-level Voxel Table pointcloud collision structure, TPU-native.

Re-derivation of the fork's flagship structure (reference
src/impl/vamp/collision/mvt.hh): a uniform voxel grid with cell size ~= the
max query radius, so a query sphere's traversal window is at most 3^3 voxels
(grid query radius clamped to 1 cell, mvt.hh:221-232).

The reference stores sparse X->Y->Z pointer tables with per-voxel SoA point
arrays and walks them scalar-per-lane.  The TPU form is dense and gather
based:
  - grid (W^3,) int32: voxel slot or -1
  - voxel_points (Nv, C, 3): per-voxel points, padded to the max occupancy C
  - voxel_count (Nv,), voxel_aabb (Nv, 6): tight per-voxel AABBs
Queries evaluate all 27 window voxels with masked gathers — dense branchless
compute instead of the reference's pointer-chasing early exits.

Collision condition matches the reference exactly: d^2 <= (r + point_radius)^2
(mvt.hh:205-276), with the same global-AABB reject and the same grid mapping
(x-axis workspace width sets the cell scale for all axes, mvt.hh:437-446).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

MAX_GRID_WIDTH = 100  # reference mvt.hh MAX_GRID_WIDTH upper bound


class MVTData(NamedTuple):
    """Dense MVT arrays; a pytree usable under jit/vmap."""

    grid: jnp.ndarray          # (W*W*W,) int32 voxel slot or -1
    voxel_points: jnp.ndarray  # (Nv, C, 3) f32, padded with +inf
    voxel_count: jnp.ndarray   # (Nv,) int32
    voxel_aabb: jnp.ndarray    # (Nv, 6) f32: min xyz, max xyz
    meta: jnp.ndarray          # (12,) f32: ws_min(3), inv_scale, W,
                               #   global_min(3), global_max(3), point_radius
    # meta layout: [wsx, wsy, wsz, inv_scale, W, gminx, gminy, gminz,
    #               gmaxx, gmaxy, gmaxz, point_radius]


def build_mvt(
    points: np.ndarray,
    min_radius: float,
    max_radius: float,
    workspace_min,
    workspace_max,
    point_radius: float,
    pad_voxels: int | None = None,
    pad_capacity: int | None = None,
) -> MVTData:
    """Host-side build (the reference builds on the CPU too, mvt.hh:147-171).

    pad_voxels / pad_capacity allow padding to common shapes for batching.
    """
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    wmin = np.asarray(workspace_min, dtype=np.float32)
    wmax = np.asarray(workspace_max, dtype=np.float32)

    ww = float(wmax[0] - wmin[0])  # x-width only, as the reference
    W = int(min(int(np.floor(ww / max_radius)), MAX_GRID_WIDTH))
    W = max(W, 1)
    inv_scale = W / ww

    if len(points):
        v = np.clip(((points - wmin) * inv_scale).astype(np.int32), 0, W - 1)
        key = (v[:, 0] * W + v[:, 1]) * W + v[:, 2]
        order = np.argsort(key, kind="stable")
        skey = key[order]
        spts = points[order]
        uniq, starts, counts = np.unique(skey, return_index=True, return_counts=True)
        gmin = points.min(axis=0)
        gmax = points.max(axis=0)
    else:
        uniq = np.zeros(0, np.int64)
        starts = counts = np.zeros(0, np.int64)
        spts = points
        gmin = np.full(3, np.float32(np.finfo(np.float32).max))
        gmax = np.full(3, np.float32(np.finfo(np.float32).min))

    nv = len(uniq)
    C = int(counts.max()) if nv else 1
    if pad_capacity is not None:
        C = max(C, pad_capacity)
    NV = max(nv, 1)
    if pad_voxels is not None:
        NV = max(NV, pad_voxels)

    grid = np.full(W * W * W, -1, dtype=np.int32)
    grid[uniq] = np.arange(nv, dtype=np.int32)
    vp = np.full((NV, C, 3), np.float32(np.inf))
    vc = np.zeros(NV, np.int32)
    va = np.zeros((NV, 6), np.float32)
    va[:, :3] = np.float32(np.finfo(np.float32).max)
    va[:, 3:] = np.float32(np.finfo(np.float32).min)
    for i in range(nv):
        pts = spts[starts[i] : starts[i] + counts[i]]
        vp[i, : len(pts)] = pts
        vc[i] = len(pts)
        va[i, :3] = pts.min(axis=0)
        va[i, 3:] = pts.max(axis=0)

    meta = np.array(
        [*wmin, inv_scale, float(W), *gmin, *gmax, point_radius], dtype=np.float32
    )
    return MVTData(
        grid=np.ascontiguousarray(grid),
        voxel_points=np.ascontiguousarray(vp),
        voxel_count=np.ascontiguousarray(vc),
        voxel_aabb=np.ascontiguousarray(va),
        meta=np.ascontiguousarray(meta),
    )


def empty_mvt() -> MVTData:
    return build_mvt(np.zeros((0, 3)), 0.01, 1.0, [0, 0, 0], [1, 1, 1], 0.0025)


def mvt_collides(mvt: MVTData, p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Query spheres (..., 3) with radii (...) -> (...) bool collision.

    Dense 27-voxel window with masked gathers (reference mvt.hh:205-276).
    """
    import jax

    mvt = jax.tree_util.tree_map(jnp.asarray, mvt)  # builds are numpy-backed
    m = mvt.meta
    ws_min = m[0:3]
    inv_scale = m[3]
    W = m[4].astype(jnp.int32)
    gmin, gmax = m[5:8], m[8:11]
    qr = r + m[11]

    inside = jnp.all(p + qr[..., None] >= gmin, -1) & jnp.all(
        p - qr[..., None] <= gmax, -1
    )

    gqr = jnp.minimum(1.0, qr * inv_scale)
    gc = (p - ws_min) * inv_scale
    wf = (W - 1).astype(jnp.float32)
    lo = jnp.maximum(0.0, gc - gqr[..., None]).astype(jnp.int32)
    hi = jnp.minimum(wf, gc + gqr[..., None]).astype(jnp.int32)

    qr2 = qr * qr
    hit = jnp.zeros(p.shape[:-1], bool)
    C = mvt.voxel_points.shape[1]
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                vx = lo[..., 0] + dx
                vy = lo[..., 1] + dy
                vz = lo[..., 2] + dz
                in_win = (vx <= hi[..., 0]) & (vy <= hi[..., 1]) & (vz <= hi[..., 2])
                cell = (vx * W + vy) * W + vz
                cell = jnp.clip(cell, 0, mvt.grid.shape[0] - 1)
                slot = mvt.grid[cell]  # (...,) int32
                occupied = slot >= 0
                slot = jnp.maximum(slot, 0)
                aabb = mvt.voxel_aabb[slot]  # (..., 6)
                near = jnp.all(p + qr[..., None] >= aabb[..., :3], -1) & jnp.all(
                    p - qr[..., None] <= aabb[..., 3:], -1
                )
                live = in_win & occupied & near
                pts = mvt.voxel_points[slot]  # (..., C, 3)
                cnt = mvt.voxel_count[slot]  # (...,)
                d2 = jnp.sum((pts - p[..., None, :]) ** 2, -1)  # (..., C)
                kmask = jnp.arange(C) < cnt[..., None]
                hit = hit | (live & jnp.any(kmask & (d2 <= qr2[..., None]), -1))
    return hit & inside
