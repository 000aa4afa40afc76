"""Raked motion validation — the reference's hot kernel, TPU-batched.

The reference validates a motion segment by checking interpolated
configurations at fractions k/N for k = 1..N (start excluded, endpoint
included), where N = rake * n, n = max(ceil(dist/rake * resolution), 1) and
rake = 8 (src/impl/vamp/planning/validate.hh:23-77).  The backstep loop that
covers the N configs 8 at a time disappears on TPU: all R >= N interpolation
points are evaluated in ONE fused FK+CC program, with fractions for k > N
clamped to the (already-checked) endpoint so checked points match the
reference's set exactly.

All functions are single-problem; batch across problems with jax.vmap.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops.fkcc import fkcc
from vamp_mvt_tpu.robots.spec import RobotSpec

RAKE = 8  # the reference's SIMD width; defines the N = 8*ceil(d*res/8) grid


def n_points_bound(spec: RobotSpec, max_dist: float) -> int:
    """Static upper bound on N for segments of length <= max_dist."""
    return RAKE * max(int(math.ceil(max_dist * spec.resolution / RAKE)) + 1, 1)


def interpolation_fractions(
    spec: RobotSpec, dist: jnp.ndarray, num: int
) -> jnp.ndarray:
    """(num,) fractions k/N (k = 1..num), clamped to 1 past the endpoint."""
    n = jnp.maximum(jnp.ceil(dist * (spec.resolution / RAKE)), 1.0)
    N = RAKE * n
    k = jnp.arange(1, num + 1, dtype=jnp.float32)
    return jnp.minimum(k / N, 1.0)


def validate_vector(
    spec: RobotSpec,
    env: Environment,
    start: jnp.ndarray,
    vector: jnp.ndarray,
    dist: jnp.ndarray,
    num: int,
) -> jnp.ndarray:
    """Validate start + t*vector for t in (0, 1]; True = collision-free.

    `num` is the static number of evaluated interpolation points and must be
    >= the dynamic N for this segment (use n_points_bound on the max segment
    length).  Mirrors validate_vector (reference planning/validate.hh:23-67).
    """
    frac = interpolation_fractions(spec, dist, num)  # (num,)
    block = start[None, :] + vector[None, :] * frac[:, None]  # (num, d)
    return jnp.all(fkcc(spec, env, block))


def validate_motion(
    spec: RobotSpec,
    env: Environment,
    start: jnp.ndarray,
    goal: jnp.ndarray,
    num: int,
) -> jnp.ndarray:
    """Validate the straight segment start -> goal (planning/validate.hh:69-77)."""
    vector = goal - start
    dist = jnp.sqrt(jnp.sum(vector * vector))
    return validate_vector(spec, env, start, vector, dist, num)


def validate_motion_batch(
    spec: RobotSpec,
    env: Environment,
    starts: jnp.ndarray,
    goals: jnp.ndarray,
    num: int,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Validate E segments at once: (E, d) x (E, d) -> (E,) bool.

    One fused FK+CC evaluation over (E, num) configurations — the workhorse
    for batched shortcut/smoothing and roadmap edge validation.  `chunk`
    bounds on-device memory: segments are processed in chunks of that size via
    lax.map (the (chunk, num, S, 3) FK intermediate is the footprint driver).
    E must be divisible by the chunk.
    """

    use_lanes = jax.default_backend() not in ("cpu",)
    if use_lanes:
        from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp

        use_lanes = fp.supports(env)

    def run(starts, goals):
        E = starts.shape[0]
        vectors = goals - starts
        dists = jnp.sqrt(jnp.sum(vectors * vectors, axis=-1))
        n = jnp.maximum(jnp.ceil(dists * (spec.resolution / RAKE)), 1.0)
        N = RAKE * n  # (E,)
        k = jnp.arange(1, num + 1, dtype=jnp.float32)
        frac = jnp.minimum(k[None, :] / N[:, None], 1.0)  # (E, num)
        if use_lanes:
            # build the block dimension-major: (d, E, num) -> (d, E*num); the
            # fused kernel consumes lanes-layout directly, skipping the
            # expensive minor-dim transpose of an (E, num, d) block
            from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp

            block_d = (
                starts.T[:, :, None] + vectors.T[:, :, None] * frac[None]
            ).reshape(spec.dimension, E * num)
            ok = fp.fkcc_hot_lanes(spec, env, block_d).reshape(E, num)
            return jnp.all(ok, axis=-1)
        block = starts[:, None, :] + vectors[:, None, :] * frac[:, :, None]
        return jnp.all(fkcc(spec, env, block), axis=-1)

    E = starts.shape[0]
    if chunk is None or chunk >= E:
        return run(starts, goals)
    # lax.map(batch_size=...) vmaps over chunks; remainder handled separately
    return jax.lax.map(
        lambda se: run(se[0][None], se[1][None])[0],
        (starts, goals),
        batch_size=chunk,
    )


def validate_motion_jobs(
    spec: RobotSpec,
    env: Environment,
    starts: jnp.ndarray,   # (E, d)
    goals: jnp.ndarray,    # (E, d)
    live: jnp.ndarray,     # (E,) bool — dead segments produce no jobs
    t_cap: int,
) -> jnp.ndarray:
    """Validate E segments with per-segment EXACT point counts, compacted.

    validate_motion_batch pads every segment to a static worst-case point
    count, so short segments (the common case in shortcut/B-spline batches)
    waste most of the kernel.  Here each live segment e contributes exactly
    N_e = RAKE * max(ceil(dist_e * res / RAKE), 1) interpolation points — the
    reference's checked set (planning/validate.hh:23-67) — laid out
    back-to-back in one flat list of `t_cap` jobs; job j maps to its segment
    via searchsorted on the cumulative counts.  One fused FK+CC evaluation
    covers all jobs; per-segment validity is an AND-reduction (scatter-min).

    Segments whose jobs overflow t_cap return False (conservative: callers
    treat them as un-shortcuttable / un-pullable, never as valid).

    TPU lowering notes (measured on v5e): the job->segment map is built with
    a boundary-mark scatter + cumsum (jnp.searchsorted lowers ~25x slower
    under vmap), and all per-segment operands ride ONE row gather of a packed
    [start | vector | offset | N] payload; per-segment AND-reduction is a
    prefix-sum difference over sorted job indices, not a scatter.
    """
    E, d = starts.shape
    vectors = goals - starts
    dists = jnp.sqrt(jnp.sum(vectors * vectors, axis=-1))
    n = jnp.maximum(jnp.ceil(dists * (spec.resolution / RAKE)), 1.0)
    N = jnp.where(live, (RAKE * n).astype(jnp.int32), 0)          # (E,)
    cum = jnp.cumsum(N)
    offsets = cum - N
    fits = cum <= t_cap

    # e_c[j] = #segment-ends at or <= j = index of j's segment (dead segments
    # contribute coincident marks and are skipped by the running sum)
    marks = jnp.zeros(t_cap, jnp.int32).at[jnp.minimum(cum, t_cap)].add(
        1, mode="drop"
    )
    e_c = jnp.minimum(jnp.cumsum(marks), E - 1)                   # (t_cap,)
    j = jnp.arange(t_cap, dtype=jnp.int32)
    valid_job = j < jnp.minimum(cum[-1], t_cap)

    payload = jnp.concatenate(
        [
            starts,
            vectors,
            offsets[:, None].astype(jnp.float32),  # exact: < 2^24
            N[:, None].astype(jnp.float32),
        ],
        axis=1,
    )                                                             # (E, 2d+2)
    pg = payload[e_c]                                             # (t_cap, 2d+2)
    k = j.astype(jnp.float32) - pg[:, 2 * d]
    frac = jnp.where(valid_job, (k + 1.0) / jnp.maximum(pg[:, 2 * d + 1], 1.0), 0.0)

    use_lanes = jax.default_backend() not in ("cpu",)
    if use_lanes:
        from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp

        use_lanes = fp.supports(env)
    if use_lanes:
        from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp

        block_d = (pg[:, :d] + pg[:, d : 2 * d] * frac[:, None]).T  # (d, t_cap)
        ok_jobs = fp.fkcc_hot_lanes(spec, env, block_d)
    else:
        block = pg[:, :d] + pg[:, d : 2 * d] * frac[:, None]        # (t_cap, d)
        ok_jobs = fkcc(spec, env, block)

    # per-segment AND over its contiguous job run: zero bad jobs inside it.
    # Dead (live=False) segments return False — they produce no jobs, so
    # nothing was checked and the result must not read as "valid motion".
    bad = jnp.where(valid_job, 1 - ok_jobs.astype(jnp.int32), 0)
    pref = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(bad)])
    lo = jnp.minimum(offsets, t_cap)
    hi = jnp.minimum(cum, t_cap)
    return (pref[hi] - pref[lo] == 0) & fits & live
