"""Dynamic-domain balanced bidirectional RRT-Connect, TPU-batched.

Re-derives the reference planner (src/impl/vamp/planning/rrtc.hh:16-247) as a
uniform-step state machine over fixed-capacity device buffers, so a batch of
problems runs in lockstep under vmap/jit.

Throughput redesign vs the reference's strictly sequential loop (one sample,
one validation per iteration):

  - GROW steps draw K = samples_per_step consecutive Halton samples at once,
    run K nearest-neighbor queries against the tree buffer (masked brute
    force, replacing the nigh kd-tree of planning/nn.hh:89), and validate all
    K extensions in ONE fused FK+CC kernel, inserting every valid extension.
    K = 1 reproduces the reference's per-iteration semantics (sample
    consumption order, dynamic-domain updates, balancing).
  - CONNECT steps advance the greedy connect chain (rrtc.hh:169-191) by up to
    C = connect_segments `range`-length increments per step: the increments'
    interpolation grids are validated together, and the valid PREFIX of
    increments is inserted — exactly the reference's partial-progress
    behavior, C increments at a time.

The batch dimension is problems; all per-step work (sampling, NN, validation,
scatter inserts) is dense masked compute, the TPU-native replacement for the
reference's rake-SIMD inner loop + branchy planner outer loop.

All functions are single-problem; batch with jax.vmap (see plan_batch).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops.fkcc import fkcc
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots.spec import RobotSpec
from vamp_mvt_tpu.sampling.halton import halton

_INF = float("inf")  # python float: module import must not init the backend


@dataclasses.dataclass(frozen=True)
class RRTCSettings:
    """Reference rrtc_settings.hh:5-20 plus TPU batching knobs (static)."""

    range: float = 2.0
    dynamic_domain: bool = True
    radius: float = 4.0
    alpha: float = 1e-4
    min_radius: float = 1.0
    balance: bool = True
    tree_ratio: float = 1.0
    max_iterations: int = 2048   # sample budget (reference semantics)
    max_samples: int = 2048      # node buffer capacity M
    start_tree_first: bool = True
    max_path: int = 256          # path buffer capacity P
    samples_per_step: int = 1    # K parallel extensions per step (1 = reference)
    connect_segments: int = 1    # C connect increments per step (1 = reference)
    # dynamic-domain pre-filter window: each GROW step examines up to K*W
    # consecutive samples (NN + radius test only — the reference's dd-skip,
    # rrtc.hh:123-126) and spends its K validation lanes on the first K
    # non-skipped ones, consuming exactly the samples examined.  W = 1 means
    # every examined sample gets a validation lane (skipped ones waste it).
    sample_window: int = 1
    # "halton" (reference default) or "threefry" (counter-based pseudo-random,
    # the TPU counterpart of the reference's x86-only XORShift sampler)
    sampler: str = "halton"
    # megakernel-only cadence: run the grow part every step and advance an
    # active connect chain in the SAME kernel step (instead of alternating
    # grow/connect steps).  Halves the while-loop trip count when connect
    # steps are ~half of all steps; each step's fixed costs (sampling, NN,
    # scalar bookkeeping) are paid once instead of twice.  Ignored by the
    # lockstep XLA planner (planning/rrtc.py keeps reference cadence).
    interleave: bool = False
    # megakernel step-cost decomposition (tools/profile_step.py ONLY): a
    # bitmask of step components to keep — 1 sampling/window, 2 NN scans +
    # config gather, 4 FK+CC tiles, 8 scalar bookkeeping, 16 solve detection.
    # -1 (default) = everything = the production kernel; any other value
    # produces a kernel whose RESULTS ARE MEANINGLESS (timing only).
    profile_mask: int = -1
    # megakernel pointcloud-phase decomposition (profiling only, see
    # fkcc_pallas.PC_PHASE_FULL): != 2 skips parts of the exact scan and
    # produces WRONG validity for colliding-with-pointcloud configurations.
    pc_phase: int = 2


class RRTCResult(NamedTuple):
    solved: jnp.ndarray      # () bool
    path: jnp.ndarray        # (P, d) padded with the last vertex
    path_length: jnp.ndarray # () i32 number of vertices
    cost: jnp.ndarray        # () f32 L2 path cost
    iterations: jnp.ndarray  # () i32 samples consumed
    size_start: jnp.ndarray  # () i32
    size_goal: jnp.ndarray   # () i32
    sample_count: jnp.ndarray  # () i32


class _State(NamedTuple):
    configs: jnp.ndarray   # (M, d)
    parents: jnp.ndarray   # (M,) i32
    radii: jnp.ndarray     # (M,) f32 dynamic-domain radii
    in_start: jnp.ndarray  # (M,) bool
    n_nodes: jnp.ndarray   # () i32
    size_start: jnp.ndarray
    size_goal: jnp.ndarray
    a_is_start: jnp.ndarray  # () bool — which tree is tree_a
    iters: jnp.ndarray     # () i32 samples consumed
    sample_idx: jnp.ndarray  # () i32 next 1-based Halton index
    connect: jnp.ndarray   # () bool — in connect mode
    c_tip: jnp.ndarray     # () i32 chain tip node index
    c_inc: jnp.ndarray     # (d,) connect increment
    c_inc_len: jnp.ndarray # () f32
    c_remaining: jnp.ndarray  # () i32 increments left in the chain
    c_other: jnp.ndarray   # () i32 target node in tree_b
    done: jnp.ndarray      # () bool
    junction_a: jnp.ndarray  # () i32
    junction_b: jnp.ndarray  # () i32
    a_start_at_join: jnp.ndarray  # () bool


def _make_step(
    spec: RobotSpec,
    s: RRTCSettings,
    env: Environment,
    num_points: int,
    phs=None,
    nn_prefix: int | None = None,
):
    M, K, C = s.max_samples, s.samples_per_step, s.connect_segments
    # NN queries scan only the first `nn_prefix` node rows.  Sound whenever
    # n_nodes <= nn_prefix for every step taken (callers guarantee it via the
    # per-segment growth bound n_nodes + steps*(K+C) <= nn_prefix); results are
    # then bit-identical to the full scan.  Trees are tiny compared to the
    # buffer capacity (MBM median graph ~34 nodes vs M = thousands), and the
    # (KW, M) masked distance matrix is the planner's bandwidth bottleneck.
    NP = M if nn_prefix is None else min(nn_prefix, M)
    KW = K * s.sample_window
    d = spec.dimension
    arange_np = jnp.arange(NP)
    lows = jnp.asarray(spec.limits_low)
    highs = jnp.asarray(spec.limits_high)
    spans = highs - lows
    dyn = jnp.asarray(s.dynamic_domain)

    def draw_samples(idx0):
        if s.sampler == "threefry":
            # key each sample by its ABSOLUTE index so a partially consumed
            # window replays the same values next step — the same exact-
            # consumption semantics the Halton path gets from its stateless
            # radical inverse
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.PRNGKey(8), i)
            )(idx0 + jnp.arange(KW))
            unit = jax.vmap(lambda k: jax.random.uniform(k, (d,)))(keys)
        else:
            unit = halton(idx0 + jnp.arange(KW), d)  # (KW, d)
        if phs is None:
            return unit * spans + lows
        # informed sampling: PHS transform + joint-limit clamp (phs.hh:161-171)
        from vamp_mvt_tpu.planning.phs import phs_samples

        key = jax.random.fold_in(jax.random.PRNGKey(17), idx0)
        radius_u = jax.random.uniform(key, (KW,))
        q = phs_samples(phs, unit, radius_u)
        return jnp.clip(q, lows, highs)

    def step(st: _State) -> _State:
        grow = ~st.connect

        # --- tree balancing (rrtc.hh:100-108), grow mode only
        asize = jnp.where(st.a_is_start, st.size_start, st.size_goal).astype(jnp.float32)
        bsize = jnp.where(st.a_is_start, st.size_goal, st.size_start).astype(jnp.float32)
        ratio = jnp.abs(asize - bsize) / asize
        do_swap = grow & ((not s.balance) | (ratio < s.tree_ratio))
        a_is_start = jnp.where(do_swap, ~st.a_is_start, st.a_is_start)

        # =============================== GROW ===============================
        # KW consecutive Halton samples (rrtc.hh:110; random/halton.hh:75-108)
        samples = draw_samples(st.sample_idx)  # (KW, d)

        cfg_nn = st.configs[:NP]
        node_mask = arange_np < st.n_nodes
        mask_a = node_mask & (st.in_start[:NP] == a_is_start)
        mask_b = node_mask & (st.in_start[:NP] != a_is_start)

        # nearest in tree_a for each sample: (KW, NP), in the dot form
        # |n|^2 + |s|^2 - 2 n.s — the SAME arithmetic the megakernel's
        # chunked MXU scan uses (its precomputed node norms + per-chunk dot
        # produce bit-identical values, so the two planners stay in lockstep
        # through fp-tie argmins)
        n2 = jnp.sum(cfg_nn * cfg_nn, axis=-1)                   # (NP,)
        s2 = jnp.sum(samples * samples, axis=-1)                 # (KW,)
        dots = jnp.dot(
            samples, cfg_nn.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2a = s2[:, None] + n2[None] - 2.0 * dots
        d2a = jnp.where(mask_a[None], d2a, _INF)
        nearest = jnp.argmin(d2a, axis=-1)                       # (KW,)
        nearest_dist = jnp.sqrt(jnp.maximum(
            jnp.take_along_axis(d2a, nearest[:, None], -1)[:, 0], 0.0
        ))
        nearest_radius = st.radii[nearest]

        dd_skip = dyn & (nearest_radius < nearest_dist)          # (KW,)

        if s.sample_window > 1:
            # spend the K validation lanes on the first K non-skipped samples;
            # consume exactly the samples examined to reach them (skipped
            # samples burn budget without validation — rrtc.hh:123-126)
            accepted = ~dd_skip
            acc_rank = jnp.cumsum(accepted.astype(jnp.int32)) - 1
            chosen = accepted & (acc_rank < K)
            nth = chosen & (acc_rank == K - 1)
            consumed = jnp.where(
                jnp.any(nth), jnp.argmax(nth) + 1, jnp.int32(KW)
            )
            perm = jnp.argsort(~chosen, stable=True)[:K]
            samples = samples[perm]
            nearest = nearest[perm]
            nearest_dist = nearest_dist[perm]
            nearest_radius = nearest_radius[perm]
            lane_ok = chosen[perm]                               # (K,)
        else:
            consumed = jnp.int32(K)
            lane_ok = ~dd_skip
        nearest_cfg = st.configs[nearest]                        # (K, d)

        reach = nearest_dist < s.range
        scale = jnp.where(reach, 1.0, s.range / jnp.maximum(nearest_dist, 1e-12))
        ext_vec = (samples - nearest_cfg) * scale[:, None]       # (K, d)
        ext_dist = jnp.minimum(nearest_dist, s.range)
        new_cfg = nearest_cfg + ext_vec

        # ============================= CONNECT ==============================
        c_tip_cfg = st.configs[st.c_tip]
        j_seg = jnp.arange(C, dtype=jnp.float32)                 # (C,)
        seg_active = jnp.arange(C) < st.c_remaining

        # ====================== one fused validation ========================
        # grow block: (K, num) points along each extension
        n_g = jnp.maximum(jnp.ceil(ext_dist * (spec.resolution / validate_mod.RAKE)), 1.0)
        kk = jnp.arange(1, num_points + 1, dtype=jnp.float32)
        frac_g = jnp.minimum(kk[None] / (validate_mod.RAKE * n_g)[:, None], 1.0)
        grow_block = nearest_cfg[:, None] + ext_vec[:, None] * frac_g[..., None]

        # connect block: (C, num) points along the next C increments
        n_c = jnp.maximum(
            jnp.ceil(st.c_inc_len * (spec.resolution / validate_mod.RAKE)), 1.0
        )
        frac_c = jnp.minimum(kk[None] / (validate_mod.RAKE * n_c), 1.0)  # (1, num)
        conn_block = (
            c_tip_cfg[None, None]
            + st.c_inc[None, None] * (j_seg[:, None, None] + frac_c[..., None])
        )  # (C, num, d)

        block = jnp.concatenate([grow_block, conn_block], axis=0)  # (K+C, num, d)
        ok_pts = fkcc(spec, env, block)                            # (K+C, num)
        ok = jnp.all(ok_pts, axis=-1)
        grow_valid, seg_valid = ok[:K], ok[K:]

        room_for = M - st.n_nodes

        # --- grow inserts: every valid, non-dd-skipped extension, in order
        g_active = grow & lane_ok & grow_valid                    # (K,)
        g_order = jnp.cumsum(g_active.astype(jnp.int32)) - 1      # position offsets
        g_ins = g_active & (g_order < room_for)
        g_pos = jnp.where(g_ins, st.n_nodes + g_order, M)         # M = dropped

        # --- connect prefix inserts
        seg_eff = jnp.where(seg_active, seg_valid, False)
        prefix = jnp.sum(jnp.cumprod(seg_eff.astype(jnp.int32)))  # leading-True run
        n_grow_ins = jnp.where(grow, jnp.sum(g_ins.astype(jnp.int32)), 0)
        c_order = jnp.arange(C)
        c_active = st.connect & (c_order < prefix)
        c_ins = c_active & (c_order < room_for)
        c_pos = jnp.where(c_ins, st.n_nodes + c_order, M)
        c_cfgs = c_tip_cfg[None] + st.c_inc[None] * (j_seg[:, None] + 1.0)
        c_parents = jnp.where(
            c_order == 0, st.c_tip, st.n_nodes + c_order - 1
        )

        # --- apply inserts (grow and connect are mutually exclusive modes)
        all_pos = jnp.where(grow, jnp.concatenate([g_pos, jnp.full(C, M)]),
                            jnp.concatenate([jnp.full(K, M), c_pos]))
        all_cfg = jnp.concatenate([new_cfg, c_cfgs])
        all_par = jnp.concatenate([nearest, c_parents])
        configs = st.configs.at[all_pos].set(all_cfg, mode="drop")
        parents = st.parents.at[all_pos].set(all_par, mode="drop")
        in_start = st.in_start.at[all_pos].set(a_is_start, mode="drop")
        radii = st.radii.at[all_pos].set(_INF, mode="drop")

        n_conn_ins = jnp.where(st.connect, jnp.sum(c_ins.astype(jnp.int32)), 0)
        n_ins = jnp.where(grow, n_grow_ins, n_conn_ins)
        n_nodes = st.n_nodes + n_ins
        size_start = st.size_start + jnp.where(a_is_start, n_ins, 0)
        size_goal = st.size_goal + jnp.where(a_is_start, 0, n_ins)

        # --- dynamic-domain radius updates (rrtc.hh:152-155, 226-237)
        inf_r = jnp.isinf(nearest_radius)
        ok_upd = jnp.where(inf_r, nearest_radius, nearest_radius * (1.0 + s.alpha))
        fail_upd = jnp.where(
            inf_r,
            jnp.float32(s.radius),
            jnp.maximum(nearest_radius * (1.0 - s.alpha), s.min_radius),
        )
        g_attempt = grow & lane_ok
        new_r = jnp.where(
            g_attempt & grow_valid & dyn,
            ok_upd,
            jnp.where(g_attempt & ~grow_valid & dyn, fail_upd, nearest_radius),
        )
        radii = radii.at[jnp.where(g_attempt, nearest, M)].set(new_r, mode="drop")

        # --- connect bookkeeping: enter connect from the most promising new
        # node (nearest to the other tree), as rrtc.hh:158-171 does per insert
        q2 = jnp.sum(new_cfg * new_cfg, axis=-1)                  # (K,)
        dots_b = jnp.dot(
            new_cfg, cfg_nn.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2b = q2[:, None] + n2[None] - 2.0 * dots_b
        d2b = jnp.where(mask_b[None], d2b, _INF)
        o_idx = jnp.argmin(d2b, axis=-1)                          # (K,)
        o_d = jnp.sqrt(jnp.maximum(
            jnp.take_along_axis(d2b, o_idx[:, None], -1)[:, 0], 0.0
        ))
        o_d_masked = jnp.where(g_ins, o_d, _INF)
        kc = jnp.argmin(o_d_masked)                               # chosen sample
        any_g = jnp.any(g_ins)
        other = o_idx[kc]
        other_dist = o_d[kc]
        n_ext = jnp.ceil(other_dist / s.range).astype(jnp.int32)
        n_ext_f = jnp.maximum(n_ext.astype(jnp.float32), 1.0)
        inc = (st.configs[other] - new_cfg[kc]) / n_ext_f
        inc_len = other_dist / n_ext_f

        enter = grow & any_g
        # chain advanced cleanly iff every attempted segment validated AND all
        # its nodes fit in the buffer (rrtc.hh:175-191 partial-progress rules)
        attempted = jnp.minimum(C, st.c_remaining)
        fail_chain = st.connect & (prefix < attempted)
        chain_ok = st.connect & ~fail_chain & (n_conn_ins == prefix)
        # new chain tip: grow -> the chosen node; connect -> last inserted
        tip_after = jnp.where(
            enter,
            g_pos[kc],
            jnp.where(chain_ok & (prefix > 0), st.n_nodes + prefix - 1, st.c_tip),
        )
        remaining_after = jnp.where(
            enter, n_ext, jnp.where(st.connect, st.c_remaining - prefix, 0)
        )
        c_inc_new = jnp.where(enter, inc, st.c_inc)
        c_inc_len_new = jnp.where(enter, inc_len, st.c_inc_len)

        joined = (
            (enter & (n_ext == 0)) | (chain_ok & (remaining_after == 0))
        ) & ~st.done
        # stay in connect while the chain is advancing and unfinished
        connect_next = (
            (enter & (n_ext > 0)) | (chain_ok & (remaining_after > 0))
        ) & ~joined & (n_nodes < M)

        done = st.done | joined
        junction_a = jnp.where(joined, tip_after, st.junction_a)
        junction_b = jnp.where(joined, jnp.where(enter, other, st.c_other), st.junction_b)
        a_start_at_join = jnp.where(joined, a_is_start, st.a_start_at_join)

        return _State(
            configs=configs,
            parents=parents,
            radii=radii,
            in_start=in_start,
            n_nodes=n_nodes,
            size_start=size_start,
            size_goal=size_goal,
            a_is_start=a_is_start,
            iters=st.iters + jnp.where(grow, consumed, 0),
            sample_idx=st.sample_idx + jnp.where(grow, consumed, 0),
            connect=connect_next,
            c_tip=tip_after,
            c_inc=c_inc_new,
            c_inc_len=c_inc_len_new,
            c_remaining=remaining_after,
            c_other=jnp.where(enter, other, st.c_other),
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


def _init_state(
    spec: RobotSpec,
    env: Environment,
    start: jnp.ndarray,
    goals: jnp.ndarray,
    goal_mask: jnp.ndarray,
    settings: RRTCSettings,
    sample_offset,
):
    """Initial planner state + direct-connection info (rrtc.hh:60-96)."""
    s = settings
    M, d = s.max_samples, spec.dimension
    G = goals.shape[0]

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
        c_inc_len=jnp.float32(1.0),
        c_remaining=jnp.int32(0),
        c_other=jnp.int32(0),
        done=any_direct,
        junction_a=jnp.int32(0),
        junction_b=jnp.int32(0),
        a_start_at_join=jnp.asarray(True),
    )
    return st, any_direct, first_direct


def _cond(s: RRTCSettings):
    def cond(st: _State):
        # a pending connect phase may finish past the sample budget, as in the
        # reference (its connect loop runs inside the final iteration)
        budget = (st.iters < s.max_iterations) | st.connect
        return (~st.done) & budget & (st.n_nodes < s.max_samples)

    return cond


def _run_steps(spec, s, env, st, num_points, phs=None, max_steps=None, nn_prefix=None):
    """Advance the state machine until done/budget (or at most max_steps).

    max_steps may be a traced scalar (the compact driver passes it dynamically
    so one compilation serves every segment length).  nn_prefix must be a
    static int; soundness requires n_nodes + max_steps*(K+C) <= nn_prefix.
    """
    step = _make_step(spec, s, env, num_points, phs=phs, nn_prefix=nn_prefix)
    cond = _cond(s)
    if max_steps is None:
        return jax.lax.while_loop(cond, step, st)

    def body(carry):
        st, k = carry
        return step(st), k + 1

    st, _ = jax.lax.while_loop(
        lambda c: cond(c[0]) & (c[1] < max_steps), body, (st, jnp.int32(0))
    )
    return st


def _finalize(
    spec, s: RRTCSettings, st: _State, start, goals, any_direct, first_direct
) -> RRTCResult:
    """Path recovery + direct-connection overrides (rrtc.hh:193-224)."""
    P, d = s.max_path, spec.dimension
    path, total, cost = _recover_path(st, P, d)

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


def plan(
    spec: RobotSpec,
    env: Environment,
    start: jnp.ndarray,           # (d,)
    goals: jnp.ndarray,           # (G, d)
    goal_mask: jnp.ndarray,       # (G,) bool
    settings: RRTCSettings,
    sample_offset: jnp.ndarray | int = 0,
    phs=None,
) -> RRTCResult:
    """Solve one problem. Batch across problems with jax.vmap.

    sample_offset mirrors the reference's RNG `skip` (robot_helper.hh:370-379).
    phs: optional planning.phs.PHS for informed sampling (AORRTC's anytime
    loop, reference aorrtc.hh:450-459).
    """
    s = settings
    num_points = validate_mod.n_points_bound(spec, s.range)
    st, any_direct, first_direct = _init_state(
        spec, env, start, goals, goal_mask, s, sample_offset
    )
    st = _run_steps(spec, s, env, st, num_points, phs=phs)
    return _finalize(spec, s, st, start, goals, any_direct, first_direct)


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


_COMPACT_CACHE: dict = {}


def plan_batch_compact(
    spec: RobotSpec,
    envs: Environment,
    starts: jnp.ndarray,
    goals: jnp.ndarray,
    goal_masks: jnp.ndarray,
    settings: RRTCSettings,
    sample_offsets: jnp.ndarray | None = None,
    segment_steps: int = 64,
    min_batch: int = 32,
) -> RRTCResult:
    """Lockstep planning with straggler compaction.

    Lockstep batches pay for their slowest member: the batch keeps stepping
    until the hardest problem finishes.  This driver runs the state machine in
    segments of `segment_steps`, and whenever the active (unfinished) count
    drops below the next power of two, finalizes the finished problems and
    gathers the stragglers into a smaller batch — so total device work tracks
    the SUM of per-problem steps instead of B x max.  Results are identical to
    plan_batch (each problem runs the exact same step sequence).
    """
    B = starts.shape[0]
    if sample_offsets is None:
        sample_offsets = jnp.zeros(B, jnp.int32)

    key = (id(spec), settings)
    if key not in _COMPACT_CACHE:
        num_points = validate_mod.n_points_bound(spec, settings.range)
        init_fn = jax.jit(
            jax.vmap(
                lambda e, st, g, m, o: _init_state(
                    spec, e, st, g, m, settings, o
                )
            )
        )

        def make_seg(prefix):
            return jax.jit(
                jax.vmap(
                    lambda e, st, ms: _run_steps(
                        spec, settings, e, st, num_points,
                        max_steps=ms, nn_prefix=prefix,
                    ),
                    in_axes=(0, 0, None),
                )
            )

        fin_fn = jax.jit(
            jax.vmap(
                lambda st, s, g, ad, fd: _finalize(
                    spec, settings, st, s, g, ad, fd
                )
            )
        )
        active_fn = jax.jit(jax.vmap(_cond(settings)))
        _COMPACT_CACHE[key] = (init_fn, make_seg, {}, fin_fn, active_fn)
    init_fn, make_seg, seg_fns, fin_fn, active_fn = _COMPACT_CACHE[key]

    M = settings.max_samples
    per_step = settings.samples_per_step + settings.connect_segments
    min_prefix = 512

    st, ad, fd = init_fn(envs, starts, goals, goal_masks, sample_offsets)
    work = dict(envs=envs, starts=starts, goals=goals, ad=ad, fd=fd)
    gidx = np.arange(B)
    out: dict[str, np.ndarray] = {}

    def write_back(res, rows):
        for f in res._fields:
            arr = np.asarray(getattr(res, f))
            if f not in out:
                out[f] = np.zeros((B,) + arr.shape[1:], arr.dtype)
            out[f][gidx[rows]] = arr[rows]

    while True:
        # NN-prefix bucket: smallest power of two that covers the current max
        # tree size plus this segment's worst-case growth.  Results are
        # bit-identical to the full-M scan (n_nodes never exceeds the prefix
        # within the segment); the bucket only bounds how many node rows the
        # masked-brute-force NN reads.
        n_max = int(np.max(np.asarray(st.n_nodes)[gidx >= 0], initial=1))
        prefix = min_prefix
        while prefix < M and prefix < n_max + 2 * per_step:
            prefix *= 2
        prefix = min(prefix, M)
        steps = segment_steps
        if prefix < M:
            steps = min(segment_steps, max((prefix - n_max) // per_step, 2))
        if prefix not in seg_fns:
            seg_fns[prefix] = make_seg(prefix)
        st = seg_fns[prefix](work["envs"], st, jnp.int32(steps))
        active = np.asarray(active_fn(st)) & (gidx >= 0)
        n_act = int(active.sum())
        cur = len(gidx)
        if n_act == 0:
            res = fin_fn(st, work["starts"], work["goals"], work["ad"], work["fd"])
            write_back(res, gidx >= 0)
            break
        target = max(min_batch, 1 << int(np.ceil(np.log2(n_act))))
        if target < cur:
            # finalize and retire everything not active, compact the rest
            res = fin_fn(st, work["starts"], work["goals"], work["ad"], work["fd"])
            write_back(res, (~active) & (gidx >= 0))
            keep = np.flatnonzero(active)
            take = np.resize(keep, target)
            st = jax.tree_util.tree_map(lambda a: a[take], st)
            work = jax.tree_util.tree_map(lambda a: a[take], work)
            new_gidx = gidx[take]
            new_gidx[len(keep):] = -1  # padding rows
            gidx = new_gidx

    return RRTCResult(**{f: jnp.asarray(v) for f, v in out.items()})
