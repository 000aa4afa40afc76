"""CAPT — Collision-Affording Point Tree, TPU-native.

Re-derivation of the reference structure (src/impl/vamp/collision/capt.hh,
RSS'24 "Collision-Affording Point Trees"): a complete binary kd-tree over the
pointcloud (padded to 2^n with +inf), median-split on cycling axes, where each
leaf stores an *affordance buffer* — every point within r_max + r_point of the
leaf's cell — so a query only descends n levels and scans one buffer.

Host-side build mirrors the reference's recursion (capt.hh:125-287), with one
deliberate fix: sibling boundary candidates are collected from the correct
(near-boundary) end of the sorted sibling range, where the reference scans a
prefix from the far end (capt.hh:252-268) and can under-fill affordance
buffers at coarse levels.  Our buffers are supersets, verified exact against
brute force in tests.

Device query (capt_collides): vectorized n-level descent via gathers on the
implicit `tests` heap — the shape of the reference's collides_simd
(capt.hh:428-512) widened from 8 SIMD lanes to the whole query batch — then a
masked scan of the (padded) per-leaf affordance slice.  Comparisons match the
reference exactly: top-AABB reject with r, leaf-AABB reject and point hits
with (r + r_point)^2, hit iff distsq <= radius_sq.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

_INF = np.float32(np.inf)


class CAPTData(NamedTuple):
    tests: jnp.ndarray       # (2^n - 1,) f32 implicit-heap split planes
    leaf_aabb: jnp.ndarray   # (2^n, 6) f32 min/max (inf for empty leaves)
    aff_points: jnp.ndarray  # (2^n, CAP, 3) f32 per-leaf affordance buffers
    aff_count: jnp.ndarray   # (2^n,) int32
    top_aabb: jnp.ndarray    # (6,)
    meta: jnp.ndarray        # (1,): point_radius  (nlog2 is implied by
                             #   tests.shape = 2^nlog2 - 1)


def _distsq_to(aabb_lo, aabb_hi, p):
    d = p - np.clip(p, aabb_lo, aabb_hi)
    return float(d @ d)


def build_capt(
    points: np.ndarray,
    r_min: float,
    r_max: float,
    r_point: float,
    pad_leaves: int | None = None,
    pad_capacity: int | None = None,
    use_native: bool = True,
) -> CAPTData:
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    if use_native and len(points):
        from vamp_mvt_tpu import native

        nat = native.capt_build_arrays(points, r_min, r_max, r_point)
        if nat is not None:
            tests, leaf_aabb, aff_flat, aff_start, top_aabb, nlog2 = nat
            return _pack_capt(
                tests, leaf_aabb, aff_flat, aff_start, top_aabb,
                pad_leaves, pad_capacity, r_point,
            )
    n = len(points)
    nlog2 = 0
    while (1 << nlog2) < n:
        nlog2 += 1
    size = 1 << nlog2
    pts = np.full((size, 3), _INF, dtype=np.float32)
    pts[:n] = points

    max_aff_l2 = (r_max + r_point) ** 2
    min_aff_l2 = (r_min + r_point) ** 2

    tests = np.full(size - 1, np.nan, dtype=np.float32)
    leaf_aabbs: list[np.ndarray] = [None] * size
    leaf_affs: list[np.ndarray] = [None] * size
    top_lo = np.full(3, _INF)
    top_hi = np.full(3, -_INF)

    argsort = np.arange(size)
    leaf_counter = [0]

    def subdivide(begin, count, i, afford, vol_lo, vol_hi, d):
        nonlocal top_lo, top_hi
        if count == 1:
            z = leaf_counter[0]
            leaf_counter[0] += 1
            rep = pts[argsort[begin]]
            aabb_lo = rep.copy()
            aabb_hi = rep.copy()
            aff_out = []
            if np.isfinite(rep[0]):
                top_lo = np.minimum(top_lo, rep)
                top_hi = np.maximum(top_hi, rep)
                aff_out.append(rep)
                # skip the affordance scan when the cell fits in the minimum
                # query ball around the representative (capt.hh:146)
                dmax = np.maximum(rep - vol_lo, vol_hi - rep)
                if not (dmax @ dmax <= min_aff_l2):
                    for idx in afford:
                        p = pts[idx]
                        if _distsq_to(vol_lo, vol_hi, p) <= max_aff_l2:
                            aabb_lo = np.minimum(aabb_lo, p)
                            aabb_hi = np.maximum(aabb_hi, p)
                            aff_out.append(p)
            else:
                aabb_lo = np.full(3, _INF)
                aabb_hi = np.full(3, _INF)
            leaf_aabbs[z] = np.concatenate([aabb_lo, aabb_hi])
            leaf_affs[z] = (
                np.stack(aff_out) if aff_out else np.zeros((0, 3), np.float32)
            )
            return

        seg = argsort[begin : begin + count]
        seg_sorted = seg[np.argsort(pts[seg, d], kind="stable")]
        argsort[begin : begin + count] = seg_sorted
        mid = count // 2
        test = (pts[seg_sorted[mid - 1], d] + pts[seg_sorted[mid], d]) / 2.0
        tests[i] = test

        lo_vol_hi = vol_hi.copy(); lo_vol_hi[d] = test
        hi_vol_lo = vol_lo.copy(); hi_vol_lo[d] = test

        afford = np.asarray(afford, dtype=np.int64)
        if len(afford):
            coords = pts[afford, d]
            lo_aff = afford[coords <= test + r_max]
            hi_aff = afford[coords >= test - r_max]
        else:
            lo_aff = hi_aff = afford

        # boundary candidates from the sibling's own sorted range
        lo_half = argsort[begin : begin + mid]
        hi_half = argsort[begin + mid : begin + count]
        lo_coords = pts[lo_half, d]
        hi_coords = pts[hi_half, d]
        fin_lo = np.isfinite(lo_coords)
        fin_hi = np.isfinite(hi_coords)
        new_for_hi = lo_half[(lo_coords >= test - r_max) & fin_lo]
        new_for_lo = hi_half[(hi_coords <= test + r_max) & fin_hi]

        nd = (d + 1) % 3
        subdivide(begin, mid, 2 * i + 1,
                  np.concatenate([lo_aff, new_for_lo]), vol_lo, lo_vol_hi, nd)
        subdivide(begin + mid, count - mid, 2 * i + 2,
                  np.concatenate([hi_aff, new_for_hi]), hi_vol_lo, vol_hi, nd)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10 * (nlog2 + 3)))
    try:
        subdivide(
            0, size, 0, np.zeros(0, np.int64),
            np.full(3, -_INF), np.full(3, _INF), 0,
        )
    finally:
        sys.setrecursionlimit(old_limit)

    CAP = max(max((len(a) for a in leaf_affs), default=1), 1)
    if pad_capacity is not None:
        CAP = max(CAP, pad_capacity)
    NL = size
    if pad_leaves is not None:
        NL = max(NL, pad_leaves)

    aff = np.full((NL, CAP, 3), _INF, dtype=np.float32)
    cnt = np.zeros(NL, np.int32)
    aabbs = np.full((NL, 6), _INF, dtype=np.float32)
    for z in range(size):
        a = leaf_affs[z]
        aff[z, : len(a)] = a
        cnt[z] = len(a)
        aabbs[z] = leaf_aabbs[z]

    return CAPTData(
        tests=np.ascontiguousarray(tests),
        leaf_aabb=np.ascontiguousarray(aabbs),
        aff_points=np.ascontiguousarray(aff),
        aff_count=np.ascontiguousarray(cnt),
        top_aabb=np.concatenate([top_lo, top_hi]).astype(np.float32),
        meta=np.array([r_point], dtype=np.float32),
    )


def _pack_capt(tests, leaf_aabb, aff_flat, aff_start, top_aabb,
               pad_leaves, pad_capacity, r_point) -> CAPTData:
    """Pack flat affordance arrays into padded per-leaf buffers."""
    size = leaf_aabb.shape[0]
    counts = np.diff(aff_start).astype(np.int32)
    CAP = max(int(counts.max()) if size else 1, 1)
    if pad_capacity is not None:
        CAP = max(CAP, pad_capacity)
    NL = size if pad_leaves is None else max(size, pad_leaves)
    aff = np.full((NL, CAP, 3), _INF, dtype=np.float32)
    aabbs = np.full((NL, 6), _INF, dtype=np.float32)
    aabbs[:size] = leaf_aabb
    cnt = np.zeros(NL, np.int32)
    cnt[:size] = counts
    # one vectorized scatter instead of a python loop over 2^n leaves (the
    # loop was most of the suite's "CAPT build" median)
    total = int(aff_start[-1])
    if total:
        leaf_of = np.repeat(np.arange(size), counts)
        slot_of = np.arange(total) - aff_start[leaf_of]
        aff[leaf_of, slot_of] = aff_flat[:total]
    return CAPTData(
        tests=np.ascontiguousarray(tests),
        leaf_aabb=np.ascontiguousarray(aabbs),
        aff_points=np.ascontiguousarray(aff),
        aff_count=np.ascontiguousarray(cnt),
        top_aabb=top_aabb.astype(np.float32),
        meta=np.array([r_point], dtype=np.float32),
    )


def capt_collides(capt: CAPTData, p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Query spheres (..., 3), radii (...) -> (...) bool collision."""
    import jax

    capt = jax.tree_util.tree_map(jnp.asarray, capt)  # builds are numpy-backed
    nlog2 = (capt.tests.shape[0] + 1).bit_length() - 1  # static from shape
    r_point = capt.meta[0]

    # top-level AABB reject.  DIVERGENCE (bug fix): the reference tests the
    # RAW radius here (capt.hh:375-378) and only adds r_point after the
    # descent (:390), so it misses collisions whose query center lies within
    # (r, r + r_point] of the cloud's bounding box — measured 3 false
    # negatives per ~226k planner-realistic queries vs brute force.  We
    # inflate by r_point, making the query exact (tools/bench_capt.py
    # reports any residual disagreement vs MVT/brute force).
    lo, hi = capt.top_aabb[:3], capt.top_aabb[3:]
    dtop = p - jnp.clip(p, lo, hi)
    rt = r + r_point
    inside = jnp.sum(dtop * dtop, -1) <= rt * rt

    # n-level descent on the implicit heap (capt.hh:382-388)
    idx = jnp.zeros(p.shape[:-1], jnp.int32)
    for i in range(nlog2):
        k = i % 3
        go_right = p[..., k] >= capt.tests[idx]
        idx = 2 * idx + 1 + go_right.astype(jnp.int32)
    z = idx - capt.tests.shape[0]

    rq = r + r_point
    rq2 = rq * rq
    aabb = capt.leaf_aabb[z]  # (..., 6)
    dlf = p - jnp.clip(p, aabb[..., :3], aabb[..., 3:])
    leaf_ok = jnp.sum(dlf * dlf, -1) <= rq2

    pts = capt.aff_points[z]  # (..., CAP, 3)
    cnt = capt.aff_count[z]
    d2 = jnp.sum((pts - p[..., None, :]) ** 2, -1)
    kmask = jnp.arange(pts.shape[-2]) < cnt[..., None]
    hit = jnp.any(kmask & (d2 <= rq2[..., None]), -1)
    return inside & leaf_ok & hit
