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
