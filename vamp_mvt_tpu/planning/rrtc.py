"""Dynamic-domain balanced bidirectional RRT-Connect, TPU-batched.

Re-derives the reference planner (src/impl/vamp/planning/rrtc.hh:16-247) as a
uniform-step state machine over fixed-capacity device buffers, so that a batch
of problems runs in lockstep under vmap/jit with exactly ONE fused FK+CC edge
validation per problem per step:

  - GROW step: balance-swap trees, draw a Halton sample, masked brute-force
    nearest neighbor (replacing the nigh kd-tree, planning/nn.hh:89), dynamic-
    domain rejection, validate the extension, insert, then set up the greedy
    connect toward the other tree.
  - CONNECT step: validate one `range`-length increment of the connect chain
    (rrtc.hh:169-191); success inserts a chain node, failure returns to GROW.

The reference's per-iteration semantics (sample consumption, dynamic-domain
radius updates, tree balancing, connect chaining, parent bookkeeping) are
mirrored so solve rates and paths are comparable at equal sample sequences.

All functions are single-problem; batch with jax.vmap (see plan_batch).
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
from vamp_mvt_tpu.sampling.halton import halton

_INF = jnp.float32(jnp.inf)


@dataclasses.dataclass(frozen=True)
class RRTCSettings:
    """Mirrors reference rrtc_settings.hh:5-20 (static at trace time)."""

    range: float = 2.0
    dynamic_domain: bool = True
    radius: float = 4.0
    alpha: float = 1e-4
    min_radius: float = 1.0
    balance: bool = True
    tree_ratio: float = 1.0
    max_iterations: int = 2048
    max_samples: int = 2048  # node buffer capacity M
    start_tree_first: bool = True
    max_path: int = 256  # path buffer capacity P


class RRTCResult(NamedTuple):
    solved: jnp.ndarray      # () bool
    path: jnp.ndarray        # (P, d) padded with the last vertex
    path_length: jnp.ndarray # () i32 number of vertices
    cost: jnp.ndarray        # () f32 L2 path cost
    iterations: jnp.ndarray  # () i32
    size_start: jnp.ndarray  # () i32
    size_goal: jnp.ndarray   # () i32
    sample_count: jnp.ndarray  # () i32 Halton samples consumed


class _State(NamedTuple):
    configs: jnp.ndarray   # (M, d)
    parents: jnp.ndarray   # (M,) i32
    radii: jnp.ndarray     # (M,) f32 dynamic-domain radii
    in_start: jnp.ndarray  # (M,) bool
    n_nodes: jnp.ndarray   # () i32
    size_start: jnp.ndarray
    size_goal: jnp.ndarray
    a_is_start: jnp.ndarray  # () bool — which tree is tree_a
    iters: jnp.ndarray     # () i32
    sample_idx: jnp.ndarray  # () i32 (next 1-based Halton index to use)
    connect: jnp.ndarray   # () bool — in connect mode
    c_tip: jnp.ndarray     # () i32 chain tip node index
    c_inc: jnp.ndarray     # (d,) connect increment
    c_inc_len: jnp.ndarray # () f32
    c_n_ext: jnp.ndarray   # () i32
    c_i_ext: jnp.ndarray   # () i32
    c_other: jnp.ndarray   # () i32 target node in tree_b
    done: jnp.ndarray      # () bool
    junction_a: jnp.ndarray  # () i32
    junction_b: jnp.ndarray  # () i32
    a_start_at_join: jnp.ndarray  # () bool


def _nearest(configs, mask, q):
    d2 = jnp.sum((configs - q) ** 2, axis=-1)
    d2 = jnp.where(mask, d2, _INF)
    idx = jnp.argmin(d2)
    return idx, jnp.sqrt(d2[idx])


def _make_step(spec: RobotSpec, s: RRTCSettings, env: Environment, num_points: int):
    M = s.max_samples
    arange_m = jnp.arange(M)

    def step(st: _State) -> _State:
        grow = ~st.connect

        # --- tree balancing (rrtc.hh:100-108), grow mode only
        asize = jnp.where(st.a_is_start, st.size_start, st.size_goal).astype(jnp.float32)
        bsize = jnp.where(st.a_is_start, st.size_goal, st.size_start).astype(jnp.float32)
        ratio = jnp.abs(asize - bsize) / asize
        do_swap = grow & ((not s.balance) | (ratio < s.tree_ratio))
        a_is_start = jnp.where(do_swap, ~st.a_is_start, st.a_is_start)

        # --- sample (grow mode consumes one Halton index)
        unit = halton(st.sample_idx, spec.dimension)
        sample = unit * (spec.limits_high - spec.limits_low) + spec.limits_low
        sample_idx = st.sample_idx + grow.astype(jnp.int32)

        # --- nearest in tree_a (rrtc.hh:114)
        node_mask = arange_m < st.n_nodes
        mask_a = node_mask & (st.in_start == a_is_start)
        nearest, nearest_dist = _nearest(st.configs, mask_a, sample)
        nearest_cfg = st.configs[nearest]
        nearest_radius = st.radii[nearest]

        # --- dynamic-domain rejection (rrtc.hh:123-126)
        dd_skip = jnp.asarray(s.dynamic_domain) & (nearest_radius < nearest_dist)

        # --- extension vector (rrtc.hh:132-134)
        reach = nearest_dist < s.range
        scale = jnp.where(reach, 1.0, s.range / jnp.maximum(nearest_dist, 1e-12))
        ext_vec = (sample - nearest_cfg) * scale
        ext_dist = jnp.minimum(nearest_dist, s.range)

        # --- single fused validation for either mode
        c_prior = st.configs[st.c_tip]
        v_start = jnp.where(grow, nearest_cfg, c_prior)
        v_vec = jnp.where(grow, ext_vec, st.c_inc)
        v_dist = jnp.where(grow, ext_dist, st.c_inc_len)
        valid = validate_mod.validate_vector(spec, env, v_start, v_vec, v_dist, num_points)

        room = st.n_nodes < M
        grow_active = grow & ~dd_skip
        grow_ok = grow_active & valid & room

        # --- GROW success: insert node (rrtc.hh:142-155)
        new_cfg = nearest_cfg + ext_vec
        n = st.n_nodes
        insert_grow = grow_ok
        # --- dynamic-domain radius updates
        inf_radius = jnp.isinf(nearest_radius)
        radii = st.radii
        ok_update = jnp.where(inf_radius, nearest_radius, nearest_radius * (1.0 + s.alpha))
        fail_update = jnp.where(
            inf_radius,
            jnp.float32(s.radius),
            jnp.maximum(nearest_radius * (1.0 - s.alpha), s.min_radius),
        )
        grow_fail = grow_active & ~valid
        new_nearest_radius = jnp.where(
            grow_ok & jnp.asarray(s.dynamic_domain),
            ok_update,
            jnp.where(grow_fail & jnp.asarray(s.dynamic_domain), fail_update, nearest_radius),
        )
        radii = radii.at[nearest].set(new_nearest_radius)

        # --- connect setup: nearest in tree_b from the new node (rrtc.hh:158-171)
        mask_b = node_mask & (st.in_start != a_is_start)
        other, other_dist = _nearest(st.configs, mask_b, new_cfg)
        n_ext = jnp.ceil(other_dist / s.range).astype(jnp.int32)
        n_ext_f = jnp.maximum(n_ext.astype(jnp.float32), 1.0)
        inc = (st.configs[other] - new_cfg) / n_ext_f
        inc_len = other_dist / n_ext_f

        # --- CONNECT step: insert chain node (rrtc.hh:175-191)
        conn_active = st.connect
        conn_ok = conn_active & valid & room
        next_cfg = c_prior + st.c_inc

        # --- apply insertion (at most one node per step)
        do_insert = (insert_grow | conn_ok) & ~st.done
        ins_cfg = jnp.where(insert_grow, new_cfg, next_cfg)
        ins_parent = jnp.where(insert_grow, nearest, st.c_tip)
        # masked insert: write the old value back when not inserting
        write = jnp.where(do_insert, n, M - 1)
        configs = st.configs.at[write].set(
            jnp.where(do_insert, ins_cfg, st.configs[write])
        )
        parents = st.parents.at[write].set(
            jnp.where(do_insert, ins_parent, st.parents[write])
        )
        in_start = st.in_start.at[write].set(
            jnp.where(do_insert, a_is_start, st.in_start[write])
        )
        radii = radii.at[write].set(jnp.where(do_insert, _INF, radii[write]))
        n_nodes = n + do_insert.astype(jnp.int32)
        size_start = st.size_start + (do_insert & a_is_start).astype(jnp.int32)
        size_goal = st.size_goal + (do_insert & ~a_is_start).astype(jnp.int32)

        # --- connect bookkeeping
        i_ext = jnp.where(conn_ok, st.c_i_ext + 1, st.c_i_ext)
        # entering connect mode from grow
        enter = insert_grow & ~st.done
        c_tip = jnp.where(enter | conn_ok, n, st.c_tip)
        c_inc = jnp.where(enter, inc, st.c_inc)
        c_inc_len = jnp.where(enter, inc_len, st.c_inc_len)
        c_n_ext = jnp.where(enter, n_ext, st.c_n_ext)
        i_ext = jnp.where(enter, 0, i_ext)
        c_other = jnp.where(enter, other, st.c_other)

        # connected when the chain completes (rrtc.hh:193); n_ext == 0 connects
        # immediately on entry (zero-length connect)
        now_n_ext = jnp.where(enter, n_ext, st.c_n_ext)
        joined = ((enter | conn_ok) & (i_ext >= now_n_ext)) & ~st.done
        connect = jnp.where(
            st.done, st.connect, (enter | (conn_active & conn_ok)) & ~joined
        )
        # budget exhaustion inside connect also drops back to grow
        connect = connect & room

        done = st.done | joined
        junction_a = jnp.where(joined, c_tip, st.junction_a)
        junction_b = jnp.where(joined, c_other, st.junction_b)
        a_start_at_join = jnp.where(joined, a_is_start, st.a_start_at_join)

        iters = st.iters + grow.astype(jnp.int32)

        return _State(
            configs=configs,
            parents=parents,
            radii=radii,
            in_start=in_start,
            n_nodes=n_nodes,
            size_start=size_start,
            size_goal=size_goal,
            a_is_start=a_is_start,
            iters=iters,
            sample_idx=sample_idx,
            connect=connect,
            c_tip=c_tip,
            c_inc=c_inc,
            c_inc_len=c_inc_len,
            c_n_ext=c_n_ext,
            c_i_ext=i_ext,
            c_other=c_other,
            done=done,
            junction_a=junction_a,
            junction_b=junction_b,
            a_start_at_join=a_start_at_join,
        )

    return step


def _walk(parents: jnp.ndarray, start_idx: jnp.ndarray, cap: int):
    """Chain of node indices from start_idx to its tree root.

    Returns (idxs (cap,), length).  Past the root the chain repeats the root.
    """

    def body(i, carry):
        cur, idxs, length = carry
        idxs = idxs.at[i].set(cur)
        at_root = parents[cur] == cur
        length = jnp.where((length < 0) & at_root, i + 1, length)
        return parents[cur], idxs, length

    _, idxs, length = jax.lax.fori_loop(
        0, cap, body, (start_idx, jnp.zeros(cap, jnp.int32), jnp.int32(-1))
    )
    return idxs, jnp.maximum(length, 1)


def _recover_path(st: _State, P: int, d: int):
    """Reconstruct the path through both junction nodes (rrtc.hh:193-224)."""
    chain_a, la = _walk(st.parents, st.junction_a, P)
    chain_b, lb = _walk(st.parents, st.junction_b, P)
    total = la + lb

    k = jnp.arange(P)
    path = jnp.zeros((P, d), jnp.float32)
    # chain A reversed: root_a ... junction_a at positions 0..la-1
    pos_a = jnp.where(k < la, la - 1 - k, P + 1)
    path = path.at[pos_a].set(st.configs[chain_a], mode="drop")
    # chain B forward: junction_b ... root_b at positions la..la+lb-1
    pos_b = jnp.where(k < lb, la + k, P + 1)
    path = path.at[pos_b].set(st.configs[chain_b], mode="drop")

    # If tree_a was the goal tree at join, reverse the whole path
    def rev(p):
        flipped = jnp.flip(p, axis=0)
        return jnp.roll(flipped, total - P, axis=0)

    path = jnp.where(st.a_start_at_join, path, rev(path))
    # pad the tail with the last vertex (useful for fixed-shape consumers)
    last = path[jnp.maximum(total - 1, 0)]
    path = jnp.where((k < total)[:, None], path, last[None, :])
    seg = path[1:] - path[:-1]
    lens = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
    cost = jnp.sum(jnp.where(k[1:] < total, lens, 0.0))
    return path, total, cost


def plan(
    spec: RobotSpec,
    env: Environment,
    start: jnp.ndarray,           # (d,)
    goals: jnp.ndarray,           # (G, d)
    goal_mask: jnp.ndarray,       # (G,) bool
    settings: RRTCSettings,
    sample_offset: jnp.ndarray | int = 0,
) -> RRTCResult:
    """Solve one problem. Batch across problems with jax.vmap.

    sample_offset mirrors the reference's RNG `skip` (robot_helper.hh:370-379).
    """
    s = settings
    M, P, d = s.max_samples, s.max_path, spec.dimension
    G = goals.shape[0]
    num_points = validate_mod.n_points_bound(spec, s.range)

    # --- straight-line goal check (rrtc.hh:60-73)
    span = float(np.linalg.norm(spec.limits_high - spec.limits_low))
    direct_points = validate_mod.n_points_bound(spec, span)
    direct = validate_mod.validate_motion_batch(
        spec, env, jnp.broadcast_to(start, (G, d)), goals, direct_points
    )
    direct = direct & goal_mask
    any_direct = jnp.any(direct)
    first_direct = jnp.argmax(direct)

    # --- init state: node 0 = start; nodes 1..G = goals.  Masked-out goals
    # are parked far outside the workspace so NN never selects them.
    configs = jnp.zeros((M, d), jnp.float32)
    configs = configs.at[0].set(start)
    far = jnp.where(goal_mask[:, None], 0.0, 1e8)
    configs = jax.lax.dynamic_update_slice(
        configs, (goals + far).astype(jnp.float32), (1, 0)
    )
    parents = jnp.concatenate(
        [jnp.arange(1 + G, dtype=jnp.int32), jnp.zeros(M - 1 - G, jnp.int32)]
    )
    in_start = jnp.zeros(M, bool).at[0].set(True)
    n_goals = jnp.sum(goal_mask.astype(jnp.int32))

    st = _State(
        configs=configs,
        parents=parents,
        radii=jnp.full((M,), _INF),
        in_start=in_start,
        n_nodes=jnp.int32(1 + G),
        size_start=jnp.int32(1),
        size_goal=n_goals,
        a_is_start=jnp.asarray(not s.start_tree_first),
        iters=jnp.int32(0),
        sample_idx=jnp.int32(sample_offset) + 1,
        connect=jnp.asarray(False),
        c_tip=jnp.int32(0),
        c_inc=jnp.zeros(d, jnp.float32),
        c_inc_len=jnp.float32(0),
        c_n_ext=jnp.int32(0),
        c_i_ext=jnp.int32(0),
        c_other=jnp.int32(0),
        done=any_direct,
        junction_a=jnp.int32(0),
        junction_b=jnp.int32(0),
        a_start_at_join=jnp.asarray(True),
    )

    step = _make_step(spec, s, env, num_points)

    def cond(st: _State):
        # a pending connect phase may finish past the iteration limit, as in
        # the reference (its connect loop runs inside the final iteration)
        budget = (st.iters < s.max_iterations) | st.connect
        return (~st.done) & budget & (st.n_nodes < M)

    st = jax.lax.while_loop(cond, step, st)

    path, total, cost = _recover_path(st, P, d)

    # Direct-connection result overrides (path = [start, goal])
    direct_goal = goals[first_direct]
    k = jnp.arange(P)
    direct_path = jnp.where((k == 0)[:, None], start[None, :], direct_goal[None, :])
    path = jnp.where(any_direct, direct_path, path)
    total = jnp.where(any_direct, 2, total)
    cost = jnp.where(
        any_direct, jnp.sqrt(jnp.sum((direct_goal - start) ** 2)), cost
    )

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


def plan_batch(
    spec: RobotSpec,
    envs: Environment,              # batched environment (leading axis B)
    starts: jnp.ndarray,            # (B, d)
    goals: jnp.ndarray,             # (B, G, d)
    goal_masks: jnp.ndarray,        # (B, G)
    settings: RRTCSettings,
    sample_offsets: jnp.ndarray | None = None,  # (B,)
) -> RRTCResult:
    """Solve a batch of problems in lockstep (vmapped state machine)."""
    if sample_offsets is None:
        sample_offsets = jnp.zeros(starts.shape[0], jnp.int32)
    return jax.vmap(
        lambda e, st, g, m, o: plan(spec, e, st, g, m, settings, o)
    )(envs, starts, goals, goal_masks, sample_offsets)
