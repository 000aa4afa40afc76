"""AORRTC — anytime asymptotically-optimal meta-planner.

Re-derivation of the reference meta-algorithm (src/impl/vamp/planning/
aorrtc.hh:350-492): RRT-Connect for an initial solution, intermediate
simplification, then repeated informed searches with a prolate-hyperspheroid
sampler whose transverse diameter shrinks with every improvement.

Both reference refinement strategies are implemented: `anytime=True` runs
fresh RRT-Connect searches over the PHS-restricted sample distribution
(aorrtc.hh:449-462); `anytime=False` (the reference default) runs AOX_RRTC
cost-bounded searches in the augmented space (planning/aox.py).

Multi-chip note: when a batch of AORRTC problems is sharded over a mesh, the
only cross-chip state is each problem's best cost — chip-local here; see
parallel/mesh.py for the problem-sharded execution model.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.planning import rrtc as rrtc_mod
from vamp_mvt_tpu.planning import simplify as simplify_mod
from vamp_mvt_tpu.planning.phs import PHS, make_phs
from vamp_mvt_tpu.robots.spec import RobotSpec


@dataclasses.dataclass(frozen=True)
class AORRTCSettings:
    """Mirrors reference aorrtc_settings.hh:8-23."""

    rrtc: rrtc_mod.RRTCSettings = dataclasses.field(
        default_factory=rrtc_mod.RRTCSettings
    )
    simplify: simplify_mod.SimplifySettings = dataclasses.field(
        default_factory=simplify_mod.SimplifySettings
    )
    optimize: bool = True
    simplify_intermediate: bool = True
    use_phs: bool = True
    anytime: bool = False
    max_iterations: int = 32768
    max_internal_iterations: int = 4096
    # solve_batch early exit: stop the device-wide refinement loop after this
    # many consecutive rounds with no improvement anywhere in the batch
    # (relative cost drop < stale_rel_tol).  0 disables (reference-faithful
    # fixed budget; the reference's per-problem loop has no such stop either,
    # aorrtc.hh:431-487, but a batch pays every round for ALL problems).
    stale_rounds: int = 2
    stale_rel_tol: float = 1e-3


def solve(
    spec: RobotSpec,
    env: Environment,
    start: np.ndarray,
    goals: np.ndarray,
    settings: AORRTCSettings | None = None,
    sample_offset: int = 0,
):
    """Returns (simplify-style result, iterations).  Host-driven loop over
    jitted device searches."""
    s = settings or AORRTCSettings()
    start = np.asarray(start, np.float32)
    goals = np.asarray(goals, np.float32).reshape(-1, spec.dimension)
    G = goals.shape[0]
    mask = jnp.ones(G, bool)

    plan_uniform = jax.jit(
        lambda e, st, g, m, off: rrtc_mod.plan(spec, e, st, g, m, s.rrtc, off)
    )
    plan_phs = jax.jit(
        lambda e, st, g, m, off, phs: rrtc_mod.plan(
            spec, e, st, g, m, s.rrtc, off, phs=phs
        )
    )
    simp = jax.jit(
        lambda e, p, l: simplify_mod.simplify(spec, e, p, l, s.simplify)
    )

    iters = 0
    offset = sample_offset
    # initial solution (aorrtc.hh:392-397)
    res = None
    while iters < s.max_iterations:
        res = plan_uniform(env, jnp.asarray(start), jnp.asarray(goals), mask,
                           jnp.int32(offset))
        iters += int(res.iterations)
        offset += int(res.sample_count)
        if bool(res.solved):
            break
    if res is None or not bool(res.solved):
        return res, iters

    if s.simplify_intermediate:
        sres = simp(env, res.path, res.path_length)
        best_path, best_len = sres.path, sres.path_length
        best_cost = float(sres.cost)
    else:
        best_path, best_len, best_cost = res.path, res.path_length, float(res.cost)

    if not s.optimize or int(best_len) == 2:
        return (
            simplify_mod.SimplifyResult(best_path, best_len, jnp.float32(best_cost),
                                        jnp.int32(0)),
            iters,
        )

    best_possible = float(min(np.linalg.norm(g - start) for g in goals))

    # one compiled internal search, reused across refinement rounds
    internal = dataclasses.replace(s.rrtc, max_iterations=s.max_internal_iterations)
    if s.anytime:
        plan_internal_phs = jax.jit(
            lambda e, st, g, m, off, p: rrtc_mod.plan(
                spec, e, st, g, m, internal, off, phs=p
            )
        )
        plan_internal = jax.jit(
            lambda e, st, g, m, off: rrtc_mod.plan(spec, e, st, g, m, internal, off)
        )
    else:
        # AOX_RRTC cost-bounded search (reference aorrtc.hh:443)
        from vamp_mvt_tpu.planning import aox

        plan_internal_phs = jax.jit(
            lambda e, st, g, m, off, p, mc: aox.solve(
                spec, e, st, g, m, internal, mc, off, phs=p
            )
        )
        plan_internal = jax.jit(
            lambda e, st, g, m, off, mc: aox.solve(
                spec, e, st, g, m, internal, mc, off
            )
        )

    while iters < s.max_iterations and (best_cost - best_possible) > 1e-8:
        phs = make_phs(start, goals[0], best_cost) if (s.use_phs and G == 1) else None
        extra = () if s.anytime else (jnp.float32(best_cost),)
        if phs is not None:
            r = plan_internal_phs(env, jnp.asarray(start), jnp.asarray(goals), mask,
                                  jnp.int32(offset), phs, *extra)
        else:
            r = plan_internal(env, jnp.asarray(start), jnp.asarray(goals), mask,
                              jnp.int32(offset), *extra)
        iters += int(r.iterations)
        offset += int(r.sample_count)
        if bool(r.solved):
            if s.simplify_intermediate:
                sr = simp(env, r.path, r.path_length)
                cand_path, cand_len, cand_cost = sr.path, sr.path_length, float(sr.cost)
            else:
                cand_path, cand_len, cand_cost = r.path, r.path_length, float(r.cost)
            if cand_cost < best_cost:
                best_path, best_len, best_cost = cand_path, cand_len, cand_cost

    return (
        simplify_mod.SimplifyResult(best_path, best_len, jnp.float32(best_cost),
                                    jnp.int32(0)),
        iters,
    )


def _phs_rotations(starts: np.ndarray, goals0: np.ndarray) -> np.ndarray:
    """(B, d, d) Wahba rotations, the cost-independent part of make_phs."""
    B, d = starts.shape
    rots = np.empty((B, d, d))
    for i in range(B):
        diff = goals0[i] - starts[i]
        n = np.linalg.norm(diff)
        if n < 1e-6:
            rots[i] = np.eye(d)
            continue
        wahba = np.outer(diff / n, np.eye(d)[0])
        U, _, Vt = np.linalg.svd(wahba)
        middle = np.ones(d)
        middle[-1] = np.linalg.det(U) * np.linalg.det(Vt.T)
        rots[i] = U @ np.diag(middle) @ Vt
    return rots


def _phs_batch(rots, starts, goals0, diameters) -> PHS:
    """Batched PHS pytree for per-problem transverse diameters (vectorized
    twin of make_phs; rotation precomputed once per problem)."""
    d = starts.shape[1]
    min_td = np.linalg.norm(goals0 - starts, axis=1)
    conj = np.sqrt(np.maximum(diameters**2 - min_td**2, 0.0))
    diag = np.repeat((0.5 * conj)[:, None], d, axis=1)
    diag[:, 0] = 0.5 * diameters
    tf = rots * diag[:, None, :]
    return PHS(
        center=jnp.asarray(0.5 * (starts + goals0), jnp.float32),
        tf=jnp.asarray(tf, jnp.float32),
        min_td=jnp.asarray(min_td, jnp.float32),
    )


def solve_batch(
    spec: RobotSpec,
    envs: Environment,
    starts,
    goals,
    masks,
    settings: AORRTCSettings | None = None,
    sample_offsets=None,
    history: bool = False,
):
    """Batched anytime-optimal refinement: the whole problem batch advances
    through device-wide rounds (vmapped AOX cost-bounded searches with
    per-problem cost carries + batched simplify), instead of the reference's
    one-problem host loop (aorrtc.hh:431-487).

    Returns (SimplifyResult batch, per-problem total samples[, cost history
    (rounds+1, B) when history=True]).  PHS informed sampling is used for
    single-goal rows (as the reference: aorrtc.hh:422-425 requires one goal).
    """
    from vamp_mvt_tpu.planning import aox

    s = settings or AORRTCSettings()
    starts = jnp.asarray(starts, jnp.float32)
    goals = jnp.asarray(goals, jnp.float32)
    masks = jnp.asarray(masks, bool)
    B, G, d = goals.shape
    if sample_offsets is None:
        sample_offsets = jnp.zeros(B, jnp.int32)
    offsets = jnp.asarray(sample_offsets, jnp.int32)

    plan_b = jax.jit(
        lambda e, st, g, m, off: jax.vmap(
            lambda e1, s1, g1, m1, o1: rrtc_mod.plan(spec, e1, s1, g1, m1, s.rrtc, o1)
        )(e, st, g, m, off)
    )
    simp_b = jax.jit(
        lambda e, p, l: jax.vmap(
            lambda e1, p1, l1: simplify_mod.simplify(spec, e1, p1, l1, s.simplify)
        )(e, p, l)
    )
    internal = dataclasses.replace(s.rrtc, max_iterations=s.max_internal_iterations)
    aox_phs = jax.jit(
        lambda e, st, g, m, off, mc, phs: jax.vmap(
            lambda e1, s1, g1, m1, o1, mc1, p1: aox.solve(
                spec, e1, s1, g1, m1, internal, mc1, o1, phs=p1
            )
        )(e, st, g, m, off, mc, phs)
    )
    aox_uni = jax.jit(
        lambda e, st, g, m, off, mc: jax.vmap(
            lambda e1, s1, g1, m1, o1, mc1: aox.solve(
                spec, e1, s1, g1, m1, internal, mc1, o1
            )
        )(e, st, g, m, off, mc)
    )

    # --- initial solutions (aorrtc.hh:392-397), batched ------------------
    res = plan_b(envs, starts, goals, masks, offsets)
    offsets = offsets + res.sample_count
    sres = simp_b(envs, res.path, res.path_length)
    solved0 = res.solved
    best_path = jnp.where(solved0[:, None, None], sres.path, res.path)
    best_len = jnp.where(solved0, sres.path_length, 0)
    best_cost = jnp.where(solved0, sres.cost, jnp.inf)

    if not s.optimize:
        return (
            simplify_mod.SimplifyResult(
                best_path, best_len, best_cost, jnp.zeros(B, jnp.int32)
            ),
            offsets - jnp.asarray(sample_offsets, jnp.int32),
        )

    starts_np = np.asarray(starts, np.float64)
    goals0_np = np.asarray(goals[:, 0], np.float64)
    rots = _phs_rotations(starts_np, goals0_np)
    use_phs = s.use_phs and G == 1
    span = float(np.linalg.norm(np.asarray(spec.limits_high)
                                - np.asarray(spec.limits_low)))

    rounds = max((s.max_iterations - int(s.rrtc.max_iterations))
                 // s.max_internal_iterations, 0)
    hist = [np.asarray(best_cost)]
    stale = 0
    for _ in range(rounds):
        # f32-safe unsolved sentinel: aox squares (bound - cost), so 1e30
        # overflows and degenerates its masked argmins (see aox.solve)
        mc = jnp.where(jnp.isfinite(best_cost), best_cost, jnp.float32(1e8))
        if use_phs:
            bc = np.asarray(best_cost, np.float64)
            diam = np.where(np.isfinite(bc), bc, span)
            phs = _phs_batch(rots, starts_np, goals0_np, diam)
            r = aox_phs(envs, starts, goals, masks, offsets, mc, phs)
        else:
            r = aox_uni(envs, starts, goals, masks, offsets, mc)
        offsets = offsets + r.sample_count
        sr = simp_b(envs, r.path, r.path_length)
        improved = r.solved & (sr.cost < best_cost)
        prev_cost = best_cost
        best_path = jnp.where(improved[:, None, None], sr.path, best_path)
        best_len = jnp.where(improved, sr.path_length, best_len)
        best_cost = jnp.where(improved, sr.cost, best_cost)
        if history:
            hist.append(np.asarray(best_cost))
        # early exit: no problem's cost moved meaningfully for stale_rounds
        if s.stale_rounds:
            pc, bc2 = np.asarray(prev_cost), np.asarray(best_cost)
            moved = np.any(
                (pc - bc2) > s.stale_rel_tol * np.where(np.isfinite(pc), pc, 0.0)
            )
            stale = 0 if moved else stale + 1
            if stale >= s.stale_rounds:
                break

    out = (
        simplify_mod.SimplifyResult(
            best_path, best_len, best_cost, jnp.zeros(B, jnp.int32)
        ),
        offsets - jnp.asarray(sample_offsets, jnp.int32),
    )
    return out + (np.stack(hist),) if history else out
