"""Path simplification: SHORTCUT / BSPLINE / REDUCE / PERTURB, TPU-batched.

Re-derives reference src/impl/vamp/planning/simplify.hh:14-261 on fixed-size
padded path buffers:

- SHORTCUT (simplify.hh:115-141): the reference scans pairs sequentially with
  a validate call per pair.  Here ALL candidate pairs are validated in one
  fused FK+CC kernel, then the reference's exact greedy erase order (ascending
  i, largest valid j) is replayed over the precomputed validity matrix — the
  matrix stays valid during erasure because removing vertices moves nothing.
- BSPLINE (simplify.hh:14-53): one subdivide + midpoint-pull step; all even
  indices are pulled independently (the reference's loop only reads odd
  neighbors, which it never writes), so both neighbor-segment validations for
  every index happen in a single batched call.
- REDUCE / PERTURB (simplify.hh:55-113,143-190): randomized sequential ops,
  implemented with jax.random (threefry) instead of the reference's mt19937 —
  same distribution of proposals, different stream.  Off by default, as in the
  reference (simplify_settings.hh:44 default ops = SHORTCUT, BSPLINE).

All functions are single-problem on (P, d) padded paths; batch with jax.vmap.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots.spec import RobotSpec


@dataclasses.dataclass(frozen=True)
class SimplifySettings:
    """Mirrors reference simplify_settings.hh:15-51."""

    max_iterations: int = 5
    interpolate: int = 0
    operations: tuple = ("shortcut", "bspline")
    bspline_max_steps: int = 1
    bspline_min_change: float = 0.1
    bspline_midpoint_interpolation: float = 0.5
    reduce_max_steps: int = 10
    reduce_max_empty_steps: int = 5
    reduce_range_ratio: float = 0.5
    perturb_max_steps: int = 10
    perturb_max_empty_steps: int = 5
    perturb_attempts: int = 5
    perturb_range: float = 0.1
    # device-memory bound for the XLA fallback validator: segments per fused
    # kernel invocation (None = no chunking; safe with the Pallas fkcc, which
    # streams configurations without materializing FK intermediates)
    pair_chunk: int | None = 64
    # shortcut pair-compaction caps: the first driver iteration sees the raw
    # planner path (cap_first pairs); subsequent iterations see the already-
    # shortcut path, which is short (cap_rest covers paths <= ~18 vertices)
    pair_cap_first: int = 1024
    pair_cap_rest: int = 512
    # job-list capacities for the exact-N compacted validator
    # (validate_motion_jobs): interpolation points summed over live segments.
    # Overflow is conservative (excess segments treated as invalid); caps are
    # sized so the observed MBM maximum (~29k first-pass jobs) never overflows.
    shortcut_jobs_first: int = 32768
    shortcut_jobs_rest: int = 8192
    bspline_jobs: int = 6144


class SimplifyResult(NamedTuple):
    path: jnp.ndarray         # (P, d) padded with last vertex
    path_length: jnp.ndarray  # () i32
    cost: jnp.ndarray         # () f32
    iterations: jnp.ndarray   # () i32


def path_cost(path: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    seg = path[1:] - path[:-1]
    lens = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
    k = jnp.arange(1, path.shape[0])
    return jnp.sum(jnp.where(k < length, lens, 0.0))


def _pad_tail(path: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Fill entries past `length` with the final vertex."""
    P = path.shape[0]
    k = jnp.arange(P)
    last = path[jnp.maximum(length - 1, 0)]
    return jnp.where((k < length)[:, None], path, last[None, :])


def _shortcut(spec, env, path, length, pair_cap, job_cap):
    """Batched-validation greedy shortcut (reference simplify.hh:115-141).

    Pair compaction: of the P*(P-1)/2 static candidate pairs, only those
    inside the live path (j < length, typically a few hundred) are gathered
    into a pair_cap-sized compact list, then validated with per-pair exact
    interpolation counts via the job-compacted validator (padding pairs and
    worst-case point padding would otherwise dominate the kernel cost).
    Paths long enough to exceed pair_cap candidate pairs (or job_cap points)
    simply lose the excess pairs as shortcut candidates; validity is never
    affected.
    """
    P = path.shape[0]
    # All pairs (i, j) with j >= i + 2; a static index list.
    ii, jj = np.triu_indices(P, k=2)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)
    in_range = jj < length
    cap = min(pair_cap, ii.shape[0])
    # stable partition: in-path pairs first
    order = jnp.argsort(~in_range, stable=True)[:cap]
    ii_c, jj_c = ii[order], jj[order]
    live = in_range[order]
    vflat = validate_mod.validate_motion_jobs(
        spec, env, path[ii_c], path[jj_c], live, job_cap
    )
    V = jnp.zeros((P, P), bool).at[ii_c, jj_c].set(vflat & live)

    karange = jnp.arange(P)

    def body(carry):
        idx, n, i, changed = carry
        vrow = V[idx[i]][idx]  # validity of (vertex i -> vertex k) in current path
        cand = vrow & (karange > i + 1) & (karange < n)
        has = jnp.any(cand)
        # largest valid j
        j = P - 1 - jnp.argmax(jnp.flip(cand))
        shift = jnp.where(has, j - (i + 1), 0)
        gathered = idx[jnp.minimum(karange + shift, P - 1)]
        idx = jnp.where(karange <= i, idx, gathered)
        return idx, n - shift, i + 1, changed | (shift > 0)

    def cond(carry):
        _, n, i, _ = carry
        return i < n - 2

    idx0 = jnp.arange(P, dtype=jnp.int32)
    idx, n, _, changed = jax.lax.while_loop(
        cond, body, (idx0, length, jnp.int32(0), jnp.asarray(False))
    )
    return path[idx], n, changed


def _bspline(spec, env, path, length, s: SimplifySettings):
    """One (or max_steps) subdivide + midpoint-pull passes (simplify.hh:14-53)."""
    P, d = path.shape
    mi = s.bspline_midpoint_interpolation
    j = jnp.arange(P)
    changed = jnp.asarray(False)

    for _ in range(s.bspline_max_steps):
        can = (2 * length - 1 <= P) & (length >= 3)
        # subdivide: even slots keep vertices, odd slots get midpoints
        half = j // 2
        nxt = jnp.minimum(half + 1, P - 1)
        sub = jnp.where(
            (j % 2 == 0)[:, None], path[half], 0.5 * (path[half] + path[nxt])
        )
        path = jnp.where(can, sub, path)
        length = jnp.where(can, 2 * length - 1, length)

        prev = path[jnp.maximum(j - 1, 0)]
        nxt2 = path[jnp.minimum(j + 1, P - 1)]
        t1 = path + (prev - path) * mi
        t2 = path + (nxt2 - path) * mi
        mid = t1 + (t2 - t1) * 0.5

        cand = can & (j % 2 == 0) & (j >= 2) & (j < length - 1)
        moved = jnp.sqrt(jnp.sum((path - mid) ** 2, -1)) > s.bspline_min_change
        # both neighbor segments in one batched, job-compacted validation
        seg_starts = jnp.concatenate([prev, mid])
        seg_goals = jnp.concatenate([mid, nxt2])
        keep = jnp.concatenate([cand & moved] * 2)
        v = validate_mod.validate_motion_jobs(
            spec, env, seg_starts, seg_goals, keep, s.bspline_jobs
        )
        accept = cand & moved & v[:P] & v[P:]
        path = jnp.where(accept[:, None], mid, path)
        changed = changed | jnp.any(accept)

    return path, length, changed


def _reduce(spec, env, path, length, s: SimplifySettings, key, num_long):
    """Randomized vertex removal (simplify.hh:55-113)."""
    P = path.shape[0]
    karange = jnp.arange(P)
    max_steps = s.reduce_max_steps if s.reduce_max_steps else P
    max_empty = s.reduce_max_empty_steps if s.reduce_max_empty_steps else P

    def body(carry):
        path, n, i, no_change, changed, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        max_n = n - 1
        rng_span = 1 + jnp.floor(0.5 + n.astype(jnp.float32) * s.reduce_range_ratio).astype(jnp.int32)
        p0 = jax.random.randint(k1, (), 0, jnp.maximum(max_n + 1, 1))
        lo = jnp.maximum(p0 - rng_span, 0)
        hi = jnp.minimum(max_n, p0 + rng_span)
        p1 = jax.random.randint(k2, (), lo, jnp.maximum(hi + 1, lo + 1))
        # adjust degenerate picks (reference simplify.hh:85-99)
        near = jnp.abs(p0 - p1) < 2
        p1 = jnp.where(near & (p0 < max_n - 1), p0 + 2, p1)
        p1 = jnp.where(near & ~(p0 < max_n - 1) & (p0 > 1), p0 - 2, p1)
        skip = near & ~(p0 < max_n - 1) & ~(p0 > 1)
        a = jnp.minimum(p0, p1)
        b = jnp.maximum(p0, p1)
        v = validate_mod.validate_motion(spec, env, path[a], path[b], num_long)
        do = v & ~skip & (b - a >= 2)
        shift = jnp.where(do, b - (a + 1), 0)
        gathered = path[jnp.minimum(karange + shift, P - 1)]
        path = jnp.where(do, jnp.where((karange <= a)[:, None], path, gathered), path)
        n = n - shift
        no_change = jnp.where(do, 0, no_change + 1)
        return path, n, i + 1, no_change, changed | do, key

    def cond(carry):
        _, n, i, no_change, _, _ = carry
        return ((i < max_steps) | (no_change < max_empty)) & (n >= 3) & (i < 4 * max_steps + 4 * max_empty)

    path, length, _, _, changed, _ = jax.lax.while_loop(
        cond, body, (path, length, jnp.int32(0), jnp.int32(0), jnp.asarray(False), key)
    )
    return path, length, changed


def _perturb(spec, env, path, length, s: SimplifySettings, key, num_long):
    """Randomized vertex perturbation toward lower cost (simplify.hh:143-190)."""
    P, d = path.shape
    lows = jnp.asarray(spec.limits_low)
    highs = jnp.asarray(spec.limits_high)
    max_steps = s.perturb_max_steps if s.perturb_max_steps else P
    max_empty = s.perturb_max_empty_steps if s.perturb_max_empty_steps else P

    def body(carry):
        path, i, no_change, changed, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (), 1, jnp.maximum(length - 1, 2))
        cur, before, after = path[idx], path[idx - 1], path[idx + 1]
        old_cost = jnp.sqrt(jnp.sum((cur - before) ** 2)) + jnp.sqrt(
            jnp.sum((cur - after) ** 2)
        )

        def attempt(carry2):
            best, found, a, key2 = carry2
            key2, ka = jax.random.split(key2)
            target = jax.random.uniform(ka, (d,)) * (highs - lows) + lows
            new = cur + (target - cur) * s.perturb_range
            new_cost = jnp.sqrt(jnp.sum((new - before) ** 2)) + jnp.sqrt(
                jnp.sum((new - after) ** 2)
            )
            v1 = validate_mod.validate_motion(spec, env, before, new, num_long)
            v2 = validate_mod.validate_motion(spec, env, after, new, num_long)
            ok = (new_cost < old_cost) & v1 & v2 & ~found
            best = jnp.where(ok, new, best)
            return best, found | ok, a + 1, key2

        best, found, _, _ = jax.lax.while_loop(
            lambda c: (c[2] < s.perturb_attempts) & ~c[1],
            attempt,
            (cur, jnp.asarray(False), jnp.int32(0), k2),
        )
        path = jnp.where(found, path.at[idx].set(best), path)
        no_change = jnp.where(found, 0, no_change + 1)
        return path, i + 1, no_change, changed | found, key

    def cond(carry):
        _, i, no_change, _, _ = carry
        return (i < max_steps) & (no_change < max_empty) & (length >= 3)

    path, _, _, changed, _ = jax.lax.while_loop(
        cond, body, (path, jnp.int32(0), jnp.int32(0), jnp.asarray(False), key)
    )
    return path, length, changed


def _driver_iteration(spec, env, s: SimplifySettings, pair_cap, job_cap):
    """One pass of the op sequence (the body of the reference's driver loop,
    simplify.hh:239-256)."""
    span = float(np.linalg.norm(spec.limits_high - spec.limits_low))
    num_long = validate_mod.n_points_bound(spec, span)

    def body(carry):
        path, length, _, iters, key = carry
        changed = jnp.asarray(False)
        for op in s.operations:
            if op == "shortcut":
                path, length, ch = _shortcut(
                    spec, env, path, length, pair_cap=pair_cap,
                    job_cap=job_cap,
                )
            elif op == "bspline":
                path, length, ch = _bspline(spec, env, path, length, s)
            elif op == "reduce":
                key, sub = jax.random.split(key)
                path, length, ch = _reduce(spec, env, path, length, s, sub, num_long)
            elif op == "perturb":
                key, sub = jax.random.split(key)
                path, length, ch = _perturb(spec, env, path, length, s, sub, num_long)
            else:
                raise ValueError(f"unknown op {op}")
            changed = changed | ch
        return path, length, changed, iters + 1, key

    return body


def simplify(
    spec: RobotSpec,
    env: Environment,
    path: jnp.ndarray,      # (P, d) padded path
    length: jnp.ndarray,    # () i32
    settings: SimplifySettings,
    rng_key: jnp.ndarray | None = None,
) -> SimplifyResult:
    """Simplify one path (reference simplify.hh:192-259 driver)."""
    s = settings
    P, d = path.shape
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    span = float(np.linalg.norm(spec.limits_high - spec.limits_low))
    num_long = validate_mod.n_points_bound(spec, span)

    first = path[0]
    last = path[jnp.maximum(length - 1, 0)]
    straight = (length <= 2) | validate_mod.validate_motion(
        spec, env, first, last, num_long
    )

    def make_body(pair_cap, job_cap):
        return _driver_iteration(spec, env, s, pair_cap, job_cap)

    def driver(path, length):
        # first iteration at the full pair cap (raw planner path)
        path, length, changed, iters, key = make_body(
            s.pair_cap_first, s.shortcut_jobs_first
        )((path, length, jnp.asarray(True), jnp.int32(0), rng_key))

        # remaining iterations at the small cap (paths are short by now)
        def cond(carry):
            _, _, changed, iters, _ = carry
            return changed & (iters < s.max_iterations)

        path, length, _, iters, _ = jax.lax.while_loop(
            cond,
            make_body(s.pair_cap_rest, s.shortcut_jobs_rest),
            (path, length, changed, iters, key),
        )
        return path, length, iters

    sim_path, sim_len, iters = driver(path, length)

    # straight-line result: [first, last]
    k = jnp.arange(P)
    straight_path = jnp.where((k == 0)[:, None], first[None], last[None])
    out_path = jnp.where(straight, straight_path, sim_path)
    out_len = jnp.where(straight, 2, sim_len)
    out_path = _pad_tail(out_path, out_len)
    return SimplifyResult(
        path=out_path,
        path_length=out_len,
        cost=path_cost(out_path, out_len),
        iterations=jnp.where(straight, 0, iters),
    )


def simplify_batch(spec, envs, paths, lengths, settings, rng_keys=None):
    B = paths.shape[0]
    if rng_keys is None:
        rng_keys = jax.random.split(jax.random.PRNGKey(0), B)
    return jax.vmap(
        lambda e, p, l, k: simplify(spec, e, p, l, settings, k)
    )(envs, paths, lengths, rng_keys)


_COMPACT_CACHE: dict = {}


def simplify_batch_compact(
    spec, envs, paths, lengths, settings, rng_keys=None, min_batch: int = 32
):
    """simplify_batch with straggler compaction.

    The vmapped driver loop is lockstep: every problem pays for the slowest
    path's iteration count.  Here each driver iteration is one device call;
    problems whose op sequence stopped changing (or that take the straight-
    line exit) are retired between iterations and the remainder compacted to
    the next power of two — mirroring rrtc.plan_batch_compact.
    """
    s = settings
    B = paths.shape[0]
    if rng_keys is None:
        rng_keys = jax.random.split(jax.random.PRNGKey(0), B)

    key = (id(spec), s)
    if key not in _COMPACT_CACHE:
        span = float(np.linalg.norm(spec.limits_high - spec.limits_low))
        num_long = validate_mod.n_points_bound(spec, span)

        def init(env, path, length, rng_key):
            first = path[0]
            last = path[jnp.maximum(length - 1, 0)]
            straight = (length <= 2) | validate_mod.validate_motion(
                spec, env, first, last, num_long
            )
            path, length, changed, iters, rng_key = _driver_iteration(
                spec, env, s, s.pair_cap_first, s.shortcut_jobs_first
            )((path, length, jnp.asarray(True), jnp.int32(0), rng_key))
            return path, length, changed, iters, rng_key, straight

        def one(env, path, length, changed, iters, rng_key, straight):
            # retired lanes (stop condition met) must not keep evolving: the
            # driver only writes results back at compaction events, and with
            # RNG ops the path itself would drift past its stop point
            new = _driver_iteration(
                spec, env, s, s.pair_cap_rest, s.shortcut_jobs_rest
            )((path, length, changed, iters, rng_key))
            active = changed & (iters < s.max_iterations) & ~straight
            old = (path, length, changed, iters, rng_key)
            return tuple(
                jnp.where(active, nv, ov) for nv, ov in zip(new, old)
            )

        def fin(path, length, iters, straight, orig_path, orig_length):
            P = path.shape[0]
            first = orig_path[0]
            last = orig_path[jnp.maximum(orig_length - 1, 0)]
            k = jnp.arange(P)
            straight_path = jnp.where((k == 0)[:, None], first[None], last[None])
            out_path = jnp.where(straight, straight_path, path)
            out_len = jnp.where(straight, 2, length)
            out_path = _pad_tail(out_path, out_len)
            return SimplifyResult(
                path=out_path,
                path_length=out_len,
                cost=path_cost(out_path, out_len),
                iterations=jnp.where(straight, 0, iters),
            )

        _COMPACT_CACHE[key] = (
            jax.jit(jax.vmap(init)),
            jax.jit(jax.vmap(one)),
            jax.jit(jax.vmap(fin)),
        )
    init_fn, iter_fn, fin_fn = _COMPACT_CACHE[key]

    path, length, changed, iters, rng_key, straight = init_fn(
        envs, paths, lengths, rng_keys
    )
    work = dict(orig_path=paths, orig_length=lengths)
    gidx = np.arange(B)
    out: dict[str, np.ndarray] = {}

    def write_back(res, rows):
        for f in res._fields:
            arr = np.asarray(getattr(res, f))
            if f not in out:
                out[f] = np.zeros((B,) + arr.shape[1:], arr.dtype)
            out[f][gidx[rows]] = arr[rows]

    while True:
        active = (
            np.asarray(changed)
            & (np.asarray(iters) < s.max_iterations)
            & ~np.asarray(straight)
            & (gidx >= 0)
        )
        n_act = int(active.sum())
        cur = len(gidx)
        target = max(min_batch, 1 << max(int(np.ceil(np.log2(max(n_act, 1)))), 0))
        if n_act == 0 or target < cur:
            res = fin_fn(
                path, length, iters, straight,
                work["orig_path"], work["orig_length"],
            )
            write_back(res, (~active) & (gidx >= 0))
            if n_act == 0:
                break
            keep = np.flatnonzero(active)
            take = np.resize(keep, target)
            path, length, changed, iters, rng_key, straight, work = (
                jax.tree_util.tree_map(
                    lambda a: a[take],
                    (path, length, changed, iters, rng_key, straight, work),
                )
            )
            new_gidx = gidx[take]
            new_gidx[len(keep):] = -1
            gidx = new_gidx
            envs = jax.tree_util.tree_map(lambda a: a[take], envs)
        path, length, changed, iters, rng_key = iter_fn(
            envs, path, length, changed, iters, rng_key, straight
        )

    return SimplifyResult(**{f: jnp.asarray(v) for f, v in out.items()})
