"""Kernel-resident pointcloud structure: radius-class bitmaps + point chunks.

The reference's MVT/CAPT queries walk per-query voxel neighborhoods — a
scatter/gather-divergent access pattern the TPU VPU cannot vectorize (Mosaic
lane gathers only reach 128-lane tables; see tools/probe_gather.py).  This is
the TPU-native re-derivation for the fused FK+CC kernel:

1. **Certain-free bitmaps, one per robot sphere-radius class** (robots have
   4-12 distinct radii).  Voxel grid with cell ~= the MVT cell
   (mvt.hh:437-446); bit(vx,vy,vz) = 1 ("maybe") iff some point lies within
   class_radius + point_radius + cell_half_diagonal of the voxel center — a
   sphere of that class centered anywhere in a 0-bit voxel certainly cannot
   collide.  The z axis is bit-packed into one int32 word (W <= 31), so a
   query is a single chained lane-gather from a (W*W)-word table plus a bit
   shift — a few VPU ops per (sphere, 1024-config tile).
2. **Exact phase for "maybe" lanes**: points sorted by voxel, grouped into
   chunks of 8 with precomputed bounding spheres.  A chunk whose bound
   misses every flagged lane is skipped with one vector test; surviving
   chunks brute-force their 8 points.  Decisions equal brute force over the
   whole cloud — bit-identical to the XLA MVT query (collision/mvt.py),
   which is itself exact (both test d^2 <= (r + point_radius)^2).

Built host-side with numpy (the reference also builds on the host).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

MAX_CLASSES = 12     # radius classes (>= max distinct radii of shipped robots)
W_MAX = 31           # z bits must fit an int32 word
CS = 32              # points per chunk (exact-phase scan granularity)
SS = 8               # chunks per superchunk (two-level bound hierarchy)


class PCKernelData(NamedTuple):
    """Pytree of dense arrays consumed by the Pallas fkcc kernel."""

    bitmap: jnp.ndarray   # (2 * MAX_CLASSES * RROWS, 128) int32; class c
                          #   "maybe" rows [c*RROWS, (c+1)*RROWS): word
                          #   (vx*W+vy), bit vz = 1 iff a sphere of that class
                          #   centered in the voxel MIGHT hit the cloud.
                          #   Rows [(MAX_CLASSES+c)*RROWS, ...): certain-HIT
                          #   bits — 1 iff any center in the voxel DOES hit
                          #   (dist + half_diag <= class_r + point_r), letting
                          #   the kernel decide deep-colliding lanes without
                          #   the exact scan (sign-exact; see tile_vmin).
    chunks: jnp.ndarray   # (NCH, 8) f32: bound cx, cy, cz, r, pad...
    points: jnp.ndarray   # (NCH, 3*CS) f32 SMEM rows: x[CS], y[CS], z[CS]
                          #   (scalar loads; vectorized variants — MXU
                          #   matmul, lane gathers, sublane columns — were
                          #   all MEASURED SLOWER, see PARITY round 5)
    supers: jnp.ndarray   # (1, 8) f32 dummy (superchunk hierarchy retired —
                          #   production uses the flat chunk scan)
    meta: jnp.ndarray     # (1, 8) f32: wsx, wsy, wsz, inv_scale, W,
                          #   point_radius, n_chunks, unused
    radii: jnp.ndarray    # (MAX_CLASSES,) f32 class upper radii (static-ish)


def radius_classes(sphere_radii: np.ndarray) -> np.ndarray:
    """Upper radius per class; sphere k's class = index of smallest class
    radius >= its radius (computed statically in the kernel)."""
    uniq = np.unique(np.asarray(sphere_radii, np.float32))
    if len(uniq) > MAX_CLASSES:
        # bucket: keep the largest MAX_CLASSES quantile edges (conservative)
        idx = np.linspace(0, len(uniq) - 1, MAX_CLASSES).round().astype(int)
        uniq = np.maximum.reduceat(uniq, np.r_[0, idx[1:]])
        uniq = np.unique(uniq)
    out = np.full(MAX_CLASSES, uniq[-1], np.float32)
    out[: len(uniq)] = uniq
    return out


def sphere_class(radius: float, class_radii: np.ndarray) -> int:
    return int(np.argmax(np.asarray(class_radii) >= radius - 1e-7))


def build_pc_kernel(
    points: np.ndarray,
    class_radii: np.ndarray,
    workspace_min,
    workspace_max,
    point_radius: float,
    max_radius: float,
    pad_chunks: int | None = None,
) -> PCKernelData:
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    wmin = np.asarray(workspace_min, dtype=np.float32)
    wmax = np.asarray(workspace_max, dtype=np.float32)
    ww = float(wmax[0] - wmin[0])
    W = max(min(int(np.floor(ww / max(max_radius, 1e-6))), W_MAX), 1)
    cell = ww / W
    inv_scale = W / ww
    half_diag = cell * np.sqrt(3.0) / 2.0

    RROWS = (W * W + 127) // 128
    words = np.zeros((2 * MAX_CLASSES, RROWS * 128), np.uint32)

    if len(points):
        # exact point-to-voxel-center distances: a sphere of class radius
        # rho centered anywhere in voxel v is collision-free iff no point
        # lies within rho + point_radius + half_diag of v's center, so
        # bit=0 voxels are certainly free with only a half-diagonal margin.
        # Dually, if some point lies within rho + point_radius - half_diag,
        # EVERY center in v collides — the certain-hit rows decide those
        # lanes without the exact scan.
        #
        # The largest radius ever thresholded is Rmax below; the native
        # windowed scan (each point updates a (2*win+1)^3 voxel window)
        # yields exact distances up to win*cell > Rmax and +inf beyond,
        # which classifies identically to a full KDTree query at ~1/5 the
        # build cost (the query over W^3 centers was the build dominator).
        Rmax = float(np.max(class_radii)) + point_radius + half_diag
        win = int(np.floor(Rmax / cell)) + 1
        from vamp_mvt_tpu import native

        d2grid = native.voxel_mindist2(points, wmin, cell, W, win)
        if d2grid is not None:
            dist = np.sqrt(d2grid, dtype=np.float32)
        else:  # pure-python fallback
            from scipy.spatial import cKDTree

            ax = wmin[0] + (np.arange(W, dtype=np.float64) + 0.5) * cell
            ay = wmin[1] + (np.arange(W, dtype=np.float64) + 0.5) * cell
            az = wmin[2] + (np.arange(W, dtype=np.float64) + 0.5) * cell
            centers = np.stack(
                np.meshgrid(ax, ay, az, indexing="ij"), axis=-1
            ).reshape(-1, 3)
            dist = cKDTree(points).query(centers, workers=-1)[0].reshape(W, W, W)

        zshift = np.arange(W, dtype=np.uint32)
        for c, rho in enumerate(np.asarray(class_radii, np.float32)):
            R = rho + point_radius + half_diag
            marked = dist <= R
            wbits = np.bitwise_or.reduce(
                marked.astype(np.uint32) << zshift[None, None, :], axis=2
            )
            words[c, : W * W] = wbits.reshape(-1)
            Rhit = rho + point_radius - half_diag
            hit = dist <= Rhit
            hbits = np.bitwise_or.reduce(
                hit.astype(np.uint32) << zshift[None, None, :], axis=2
            )
            words[MAX_CLASSES + c, : W * W] = hbits.reshape(-1)

    # point chunks: sort by voxel key, group 8, compute bounding spheres
    if len(points):
        vox = np.clip(
            np.floor((points - wmin[None]) * inv_scale).astype(np.int64), 0, W - 1
        )
        key = (vox[:, 0] * W + vox[:, 1]) * W + vox[:, 2]
        order = np.argsort(key, kind="stable")
        spts = points[order]
    else:
        spts = points
    n = len(spts)
    nch = max((n + CS - 1) // CS, 1)
    if pad_chunks is not None:
        nch = max(nch, pad_chunks)
    FAR = np.float32(1e8)
    pts_pad = np.full((nch * CS, 3), FAR, np.float32)
    pts_pad[:n] = spts
    grp = pts_pad.reshape(nch, CS, 3)
    # bound over REAL points only; empty/padded chunks get a far bound
    realmask = (np.arange(nch * CS) < n).reshape(nch, CS)
    any_real = realmask.any(axis=1)
    rm3 = realmask[..., None]
    lo = np.where(rm3, grp, np.inf).min(axis=1)
    hi = np.where(rm3, grp, -np.inf).max(axis=1)
    cc = 0.5 * (lo + hi)
    rr = np.sqrt(
        np.where(realmask, ((grp - cc[:, None]) ** 2).sum(-1), 0.0).max(axis=1)
    )
    chunks = np.zeros((nch, 8), np.float32)
    chunks[:, :3] = np.where(any_real[:, None], cc, FAR)
    chunks[:, 3] = np.where(any_real, rr, 0.0)

    pts24 = np.concatenate([grp[:, :, 0], grp[:, :, 1], grp[:, :, 2]], axis=1)

    # the superchunk hierarchy is dead since production switched to the flat
    # chunk scan: keep a 1-row dummy so the pytree shape is stable
    live_ch = (n + CS - 1) // CS
    supers = np.zeros((1, 8), np.float32)
    supers[0, :3] = FAR

    meta = np.zeros((1, 8), np.float32)
    meta[0, :3] = wmin
    meta[0, 3] = inv_scale
    meta[0, 4] = W
    meta[0, 5] = point_radius
    meta[0, 6] = live_ch

    # numpy on purpose: callers batch many structures and transfer once at
    # stack time (per-array device transfers through the axon tunnel cost
    # milliseconds each and would dominate "build time")
    return PCKernelData(
        bitmap=words.astype(np.int32).reshape(2 * MAX_CLASSES * RROWS, 128),
        chunks=chunks,
        points=pts24,
        supers=supers,
        meta=meta,
        radii=np.asarray(class_radii, np.float32),
    )
