"""AOX_RRTC — RRT-Connect in the cost-augmented space (reference
src/impl/vamp/planning/aorrtc.hh:20-342).

The informed inner search of AORRTC: every node carries its cost-to-root; a
sampled upper cost bound c_rand in [g-hat, max_cost - h-hat] restricts which
nodes may be connection parents, nearest-neighbor queries run in the
augmented metric sqrt(d^2 + (c_rand - cost)^2), and connections to the other
tree must improve on the incumbent best cost.

The reference's GNAT tree + near-list scan (aox_nn.hh, find_nearest
aorrtc.hh:61-85) becomes an eligibility-masked argmin over the augmented
distance to the whole node buffer — exact, and TPU-shaped.  The per-node
cost-bound resampling loop (aorrtc.hh:197-237) is a bounded masked loop of
`cost_bound_resamples` rounds, each with one fused edge validation.

Scalar uniforms (c_rand draws) use counter-based threefry instead of the
reference's mt19937 — a stream divergence for an inherently random quantity.

Single-problem; batch with jax.vmap.  One sample per step (this is the
refinement search; the throughput-mode K-sampling lives in rrtc.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops.fkcc import fkcc
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.planning.rrtc import RRTCResult, RRTCSettings, _recover_path, _State
from vamp_mvt_tpu.robots.spec import RobotSpec
from vamp_mvt_tpu.sampling.halton import halton

_INF = float("inf")  # python float: module import must not init the backend


class _AOXState(NamedTuple):
    base: _State           # reuses the RRTC buffers/bookkeeping
    costs: jnp.ndarray     # (M,) cost-to-root per node
    max_cost: jnp.ndarray  # () incumbent bound


def _aug_nearest(configs, costs, mask, q, c_rand):
    """Eligibility-masked augmented-metric nearest (aorrtc.hh:61-85):
    the closest (augmented) node with costs + d <= c_rand; the tree root
    (cost 0) is always eligible.  Returns (idx, d[idx], any_eligible):
    with nothing eligible the argmin of all-inf degenerates to index 0 —
    a node of the WRONG tree for connect-target queries — so callers must
    gate on the flag (this produced loop-paths "solved" back into the
    start tree when the cost bound overflowed, see below)."""
    d = jnp.sqrt(jnp.sum((configs - q) ** 2, axis=-1))
    aug = jnp.sqrt(d * d + (c_rand - costs) ** 2)
    eligible = mask & ((costs + d <= c_rand) | (costs <= 0.0))
    aug = jnp.where(eligible, aug, _INF)
    idx = jnp.argmin(aug)
    return idx, d[idx], jnp.any(eligible)


def _validate_seg(spec, env, start, vec, dist, num_points):
    n = jnp.maximum(jnp.ceil(dist * (spec.resolution / validate_mod.RAKE)), 1.0)
    kk = jnp.arange(1, num_points + 1, dtype=jnp.float32)
    frac = jnp.minimum(kk / (validate_mod.RAKE * n), 1.0)
    block = start[None] + vec[None] * frac[:, None]
    return jnp.all(fkcc(spec, env, block))


def _make_step(spec, s: RRTCSettings, env, num_points, resamples, phs):
    M = s.max_samples
    d = spec.dimension
    arange_m = jnp.arange(M)
    lows = jnp.asarray(spec.limits_low)
    highs = jnp.asarray(spec.limits_high)
    spans = highs - lows
    dyn = jnp.asarray(s.dynamic_domain)

    def draw_sample(idx):
        unit = halton(idx[None], d)[0]
        if phs is None:
            return unit * spans + lows
        from vamp_mvt_tpu.planning.phs import phs_samples

        key = jax.random.fold_in(jax.random.PRNGKey(23), idx)
        return jnp.clip(
            phs_samples(phs, unit[None], jax.random.uniform(key, (1,)))[0],
            lows, highs,
        )

    def uniform(idx, salt):
        return jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(29 + salt), idx)
        )

    def step(ax: _AOXState) -> _AOXState:
        st = ax.base
        grow = ~st.connect

        # --- balancing
        asize = jnp.where(st.a_is_start, st.size_start, st.size_goal).astype(jnp.float32)
        bsize = jnp.where(st.a_is_start, st.size_goal, st.size_start).astype(jnp.float32)
        ratio = jnp.abs(asize - bsize) / asize
        do_swap = grow & ((not s.balance) | (ratio < s.tree_ratio))
        a_is_start = jnp.where(do_swap, ~st.a_is_start, st.a_is_start)

        sample = draw_sample(st.sample_idx)

        node_mask = arange_m < st.n_nodes
        mask_a = node_mask & (st.in_start == a_is_start)
        mask_b = node_mask & (st.in_start != a_is_start)

        # nearest goal vert to the sample (aorrtc.hh:147-152); goal verts are
        # nodes 1..G with cost 0 in the goal tree (roots)
        goal_mask = node_mask & ~st.in_start & (ax.costs <= 0.0)
        d_goals = jnp.where(
            goal_mask, jnp.sqrt(jnp.sum((st.configs - sample) ** 2, -1)), _INF
        )
        goal_vert = jnp.argmin(d_goals)
        root_idx = jnp.where(a_is_start, 0, goal_vert)
        target_idx = jnp.where(a_is_start, goal_vert, 0)

        g_hat = jnp.sqrt(jnp.sum((st.configs[root_idx] - sample) ** 2))
        h_hat = jnp.sqrt(jnp.sum((st.configs[target_idx] - sample) ** 2))
        c_range = jnp.maximum(ax.max_cost - (g_hat + h_hat), 0.0)
        c_rand = uniform(st.sample_idx, 0) * c_range + g_hat

        nearest, nearest_dist, _ = _aug_nearest(
            st.configs, ax.costs, mask_a, sample, c_rand
        )
        nearest_cfg = st.configs[nearest]
        nearest_radius = st.radii[nearest]
        dd_skip = dyn & (nearest_radius < nearest_dist)

        reach = nearest_dist < s.range
        scale = jnp.where(reach, 1.0, s.range / jnp.maximum(nearest_dist, 1e-12))
        ext_vec = (sample - nearest_cfg) * scale
        ext_dist = jnp.minimum(nearest_dist, s.range)
        new_cfg = nearest_cfg + ext_vec

        # one fused validation serves grow OR connect mode
        c_tip_cfg = st.configs[st.c_tip]
        v_start = jnp.where(grow, nearest_cfg, c_tip_cfg)
        v_vec = jnp.where(grow, ext_vec, st.c_inc)
        v_dist = jnp.where(grow, ext_dist, st.c_inc_len)
        valid = _validate_seg(spec, env, v_start, v_vec, v_dist, num_points)

        room = st.n_nodes < M
        grow_active = grow & ~dd_skip
        grow_ok = grow_active & valid & room

        new_cost0 = ax.costs[nearest] + jnp.sqrt(jnp.sum(ext_vec * ext_vec))

        # --- cost-bound resampling for a better parent (aorrtc.hh:197-237)
        def resample_body(i, carry):
            par, cost, active = carry
            g_hat_n = jnp.sqrt(jnp.sum((st.configs[root_idx] - new_cfg) ** 2))
            cr = jnp.maximum(cost - g_hat_n, 0.0)
            u = uniform(st.sample_idx, 1 + i)
            bound = u * cr + g_hat_n
            cand, cand_d, _ = _aug_nearest(
                st.configs, ax.costs, mask_a, new_cfg, bound
            )
            stop = (
                (cand == par)
                | (ax.costs[cand] + cand_d >= cost)
                | (cr <= 0.0)
            )
            active = active & ~stop
            cand_ok = active & _validate_seg(
                spec, env, st.configs[cand], new_cfg - st.configs[cand], cand_d,
                num_points,
            )
            par = jnp.where(cand_ok, cand, par)
            cost = jnp.where(cand_ok, ax.costs[cand] + cand_d, cost)
            active = active & cand_ok
            return par, cost, active

        if resamples > 0:
            par, new_cost, _ = jax.lax.fori_loop(
                0, resamples, resample_body, (nearest, new_cost0, grow_ok)
            )
        else:
            par, new_cost = nearest, new_cost0

        # --- dynamic-domain updates
        inf_r = jnp.isinf(nearest_radius)
        ok_upd = jnp.where(inf_r, nearest_radius, nearest_radius * (1.0 + s.alpha))
        fail_upd = jnp.where(
            inf_r, jnp.float32(s.radius),
            jnp.maximum(nearest_radius * (1.0 - s.alpha), s.min_radius),
        )
        grow_fail = grow_active & ~valid
        new_r = jnp.where(
            grow_ok & dyn, ok_upd,
            jnp.where(grow_fail & dyn, fail_upd, nearest_radius),
        )
        radii = st.radii.at[jnp.where(grow_active, nearest, M)].set(new_r, mode="drop")

        # --- connect target: bound is what would improve the incumbent
        o_idx, o_d, o_elig = _aug_nearest(
            st.configs, ax.costs, mask_b, new_cfg, ax.max_cost - new_cost
        )
        improves = o_elig & (new_cost + o_d + ax.costs[o_idx] < ax.max_cost)
        n_ext = jnp.ceil(o_d / s.range).astype(jnp.int32)
        n_ext_f = jnp.maximum(n_ext.astype(jnp.float32), 1.0)
        inc = (st.configs[o_idx] - new_cfg) / n_ext_f
        inc_len = o_d / n_ext_f

        # --- inserts (grow node, or one connect-chain node)
        conn_ok = st.connect & valid & room
        do_insert = (grow_ok | conn_ok) & ~st.done
        ins_cfg = jnp.where(grow_ok, new_cfg, c_tip_cfg + st.c_inc)
        ins_parent = jnp.where(grow_ok, par, st.c_tip)
        ins_cost = jnp.where(
            grow_ok, new_cost, ax.costs[st.c_tip] + st.c_inc_len
        )
        write = jnp.where(do_insert, st.n_nodes, M)
        configs = st.configs.at[write].set(ins_cfg, mode="drop")
        parents = st.parents.at[write].set(ins_parent, mode="drop")
        in_start = st.in_start.at[write].set(a_is_start, mode="drop")
        radii = radii.at[write].set(_INF, mode="drop")
        costs = ax.costs.at[write].set(ins_cost, mode="drop")
        n_nodes = st.n_nodes + do_insert.astype(jnp.int32)
        size_start = st.size_start + (do_insert & a_is_start).astype(jnp.int32)
        size_goal = st.size_goal + (do_insert & ~a_is_start).astype(jnp.int32)

        # --- connect bookkeeping (enter only when it would improve)
        enter = grow_ok & improves & ~st.done
        chain_ok = st.connect & valid & (n_nodes == st.n_nodes + 1)
        remaining_after = jnp.where(
            enter, n_ext, jnp.where(chain_ok, st.c_remaining - 1, 0)
        )
        tip_after = jnp.where(do_insert, st.n_nodes, st.c_tip)
        joined = (
            (enter & (n_ext == 0)) | (chain_ok & (remaining_after == 0))
        ) & ~st.done
        connect_next = (
            (enter & (n_ext > 0)) | (chain_ok & (remaining_after > 0))
        ) & ~joined & (n_nodes < M)

        done = st.done | joined
        base = _State(
            configs=configs, parents=parents, radii=radii, in_start=in_start,
            n_nodes=n_nodes, size_start=size_start, size_goal=size_goal,
            a_is_start=a_is_start,
            iters=st.iters + grow.astype(jnp.int32),
            sample_idx=st.sample_idx + grow.astype(jnp.int32),
            connect=connect_next,
            c_tip=tip_after,
            c_inc=jnp.where(enter, inc, st.c_inc),
            c_inc_len=jnp.where(enter, inc_len, st.c_inc_len),
            c_remaining=remaining_after,
            c_other=jnp.where(enter, o_idx, st.c_other),
            done=done,
            junction_a=jnp.where(joined, tip_after, st.junction_a),
            junction_b=jnp.where(
                joined, jnp.where(enter, o_idx, st.c_other), st.junction_b
            ),
            a_start_at_join=jnp.where(joined, a_is_start, st.a_start_at_join),
        )
        return _AOXState(base=base, costs=costs, max_cost=ax.max_cost)

    return step


def solve(
    spec: RobotSpec,
    env: Environment,
    start: jnp.ndarray,
    goals: jnp.ndarray,
    goal_mask: jnp.ndarray,
    settings: RRTCSettings,
    max_cost,
    sample_offset=0,
    phs=None,
    cost_bound_resamples: int = 4,
) -> RRTCResult:
    """One AOX_RRTC search bounded by max_cost; single problem (vmap to batch)."""
    s = settings
    M, d = s.max_samples, spec.dimension
    G = goals.shape[0]
    num_points = validate_mod.n_points_bound(spec, s.range)

    configs = jnp.zeros((M, d), jnp.float32).at[0].set(start)
    far = jnp.where(goal_mask[:, None], 0.0, 1e8)
    configs = jax.lax.dynamic_update_slice(
        configs, (goals + far).astype(jnp.float32), (1, 0)
    )
    parents = jnp.concatenate(
        [jnp.arange(1 + G, dtype=jnp.int32), jnp.zeros(M - 1 - G, jnp.int32)]
    )
    st = _State(
        configs=configs,
        parents=parents,
        radii=jnp.full((M,), _INF),
        in_start=jnp.zeros(M, bool).at[0].set(True),
        n_nodes=jnp.int32(1 + G),
        size_start=jnp.int32(1),
        size_goal=jnp.sum(goal_mask.astype(jnp.int32)),
        a_is_start=jnp.asarray(not s.start_tree_first),
        iters=jnp.int32(0),
        sample_idx=jnp.int32(sample_offset) + 1,
        connect=jnp.asarray(False),
        c_tip=jnp.int32(0),
        c_inc=jnp.zeros(d, jnp.float32),
        c_inc_len=jnp.float32(1.0),
        c_remaining=jnp.int32(0),
        c_other=jnp.int32(0),
        done=jnp.asarray(False),
        junction_a=jnp.int32(0),
        junction_b=jnp.int32(0),
        a_start_at_join=jnp.asarray(True),
    )
    # clamp the bound to an f32-SAFE magnitude: the augmented metric squares
    # (c_rand - costs), so a 1e30 "unbounded" sentinel overflows to inf and
    # collapses every masked argmin to index 0 — the start node — producing
    # loop paths joined back into the start tree that report solved with
    # near-zero cost.  1e8 keeps (c_rand)^2 ~ 1e16 finite while exceeding
    # any real path cost by orders of magnitude.
    ax = _AOXState(base=st, costs=jnp.zeros(M, jnp.float32),
                   max_cost=jnp.minimum(jnp.float32(max_cost),
                                        jnp.float32(1e8)))

    step = _make_step(spec, s, env, num_points, cost_bound_resamples, phs)

    def cond(ax: _AOXState):
        st = ax.base
        budget = (st.iters < s.max_iterations) | st.connect
        return (~st.done) & budget & (st.n_nodes < M)

    ax = jax.lax.while_loop(cond, step, ax)
    st = ax.base

    path, total, cost = _recover_path(st, s.max_path, d)
    solved = st.done
    return RRTCResult(
        solved=solved,
        path=path,
        path_length=jnp.where(solved, total, 0),
        cost=jnp.where(solved, cost, _INF),
        iterations=st.iters,
        size_start=st.size_start,
        size_goal=st.size_goal,
        sample_count=st.sample_idx - 1,
    )
