"""RRT-Connect planner megakernel: the whole solve loop in one Pallas kernel.

The lockstep XLA state machine (planning/rrtc.py) pays for its slowest batch
member: every problem executes every step of every segment, with (B, KW, M)
HBM intermediates between steps and a host round-trip per segment.  Measured
on v5e, that overhead is ~40x the useful FK+CC kernel time.

This kernel is the TPU-native answer: grid = (problems,), and each grid step
runs the ENTIRE planner loop for one problem inside the kernel —

  - node/tree state lives in VMEM (configs, per-node metadata) and SMEM
    (parents) for the whole solve; zero HBM traffic between iterations;
  - the per-step work (Halton sampling, brute-force NN, edge interpolation,
    fused FK+collision on one or two (8,128) tiles, inserts, dynamic-domain
    updates, the greedy connect chain) is all VPU/MXU vector code plus a small
    amount of SMEM scalar bookkeeping;
  - a `lax.while_loop` on scalar state stops exactly when THIS problem is
    done, so finished problems cost nothing (the reference's sequential-planner
    advantage, recovered on TPU without giving up batched execution).

Step semantics mirror planning/rrtc.py's `_make_step` (itself a re-derivation
of the reference rrtc.hh:16-247): K grow extensions + C connect increments per
step, dynamic-domain sample-window prefilter, balanced trees, greedy connect
with partial progress.  Numerical differences vs the XLA path are limited to
floating-point reduction order in the NN distances.

The kernel also walks the parent chains at the end and exports ONLY the
solution path rows (max_path x 128 per problem) — the (M, 128) node buffer
never leaves VMEM.  The straight-line direct-goal check and path
reversal/padding stay outside (one-shot XLA programs; see plan_batch_mega).
The sample budget (reference max_iterations) is a runtime scalar, so an
initial solve and a 32x-budget straggler retry share one compiled program.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops.kernels.fkcc_pallas import tile_vmin, _pad_rows, _live_counts
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.planning.rrtc import RRTCResult, RRTCSettings
from vamp_mvt_tpu.robots.spec import RobotSpec
from vamp_mvt_tpu.sampling.halton import PRIMES, _digit_counts

_BIG = 1e30          # plain floats: jnp scalars would be captured as
_INF = float("inf")  # pallas kernel constants (not allowed)



def _dotx(a, b):
    """MXU matmul at HIGHEST precision: one-hot selects must be bit-exact
    (default TPU dot truncates operands to bf16, which corrupts node indices
    and configuration values)."""
    return jnp.dot(
        a, b, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _pad_div128(n: int) -> int:
    """Smallest divisor of 128 that is >= n (points-per-edge padding)."""
    for p in (8, 16, 32, 64, 128):
        if p >= n:
            return p
    raise ValueError(f"edge needs {n} > 128 interpolation points")


def _row_to_col(row: jnp.ndarray, n: int) -> jnp.ndarray:
    """(1, n) -> (n, 1) via the diagonal-mask trick (no relayout transpose)."""
    s_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    b = jnp.broadcast_to(row[:, :n], (n, n))
    return jnp.sum(jnp.where(s_i == l_i, b, 0.0), axis=1, keepdims=True)


def _col_to_row(col: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n, 1) -> (1, n)."""
    s_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    b = jnp.broadcast_to(col[:n, :], (n, n))
    return jnp.sum(jnp.where(s_i == l_i, b, 0.0), axis=0, keepdims=True)


def _lane_cumsum(v: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along lanes of a (1, 128) f32 row."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc = v
    for sh in (1, 2, 4, 8, 16, 32, 64):
        acc = acc + jnp.where(lanes >= sh, pltpu.roll(acc, sh, 1), 0.0)
    return acc


def _halton_rows(spec: RobotSpec, idx_row: jnp.ndarray) -> list[jnp.ndarray]:
    """Per-dimension Halton radical inverses as (1, 128) f32 ROWS.

    Bit-identical to sampling/halton.py (same int digit recurrence with
    constant bases — divisions strength-reduce — and the same final single
    f32 division).  Row layout matters: the old (KW, 1) column layout
    spread every op over 16 vregs at 1/128 lane utilization, making
    sampling ~15% of the planner step; rows are one vreg per op.
    """
    d = spec.dimension
    counts = _digit_counts(d)
    rows = []
    for j in range(d):
        b = PRIMES[j]
        i = idx_row
        n = jnp.zeros_like(idx_row)
        for _ in range(counts[j]):
            n = n * b + i % b
            i = i // b
        denom = float(b ** counts[j])
        rows.append(n.astype(jnp.float32) * (1.0 / denom))
    return rows


def _kernel_config(spec: RobotSpec, s: RRTCSettings, G: int):
    d = spec.dimension
    dp = max(8, 8 * ((d + 7) // 8))
    K, C, W = s.samples_per_step, s.connect_segments, s.sample_window
    KW = K * W
    if KW > 128:
        raise ValueError("samples_per_step * sample_window must be <= 128")
    E = K + C
    Erow0 = 32 if E <= 32 else 64
    if E > 64:
        raise ValueError("K + C must be <= 64")
    N = validate_mod.n_points_bound(spec, s.range)
    P = _pad_div128(N)
    R = min(128 // P, Erow0 // 8)  # edge groups per tile (cap: rows available)
    EPT = 8 * R           # edges per tile
    # Connect edges start at a fresh tile boundary (C0) so every tile is
    # purely grow or purely connect and the kernel can skip the tiles of the
    # inactive mode each step — grow steps never pay for connect FK+CC and
    # vice versa (~2x on the per-step kernel work at the bench settings).
    C0 = ((K + EPT - 1) // EPT) * EPT
    rows = C0 + C
    if rows > 64:
        raise ValueError("aligned K + C must be <= 64 edge rows")
    Erow = 32 if rows <= 32 else 64
    NT = (rows + EPT - 1) // EPT
    M = s.max_samples
    CH = min(M, 128)      # NN chunk rows: scan ceil(n_nodes/CH) chunks per step
    assert M % CH == 0 and M % 8 == 0
    PP = max(8 * ((s.max_path + 7) // 8), 8)  # path rows (sublane-padded)
    return dict(d=d, dp=dp, K=K, C=C, W=W, KW=KW, E=E, Erow=Erow, N=N, P=P,
                R=R, EPT=EPT, NT=NT, M=M, G=G, CH=CH, C0=C0, PP=PP)


def _make_mega_kernel(spec: RobotSpec, s: RRTCSettings, counts: dict, cfg: dict):
    d, dp, K, C, KW, E, Erow = (cfg[k] for k in ("d", "dp", "K", "C", "KW", "E", "Erow"))
    P, R, EPT, NT, M, G, CH = (cfg[k] for k in ("P", "R", "EPT", "NT", "M", "G", "CH"))
    C0 = cfg["C0"]
    res8 = float(spec.resolution) / 8.0
    rng = float(s.range)
    lows = [float(x) for x in spec.limits_low]
    spans = [float(h - l) for l, h in zip(spec.limits_low, spec.limits_high)]
    dyn = bool(s.dynamic_domain)
    balance = bool(s.balance)
    INTER = bool(getattr(s, "interleave", False))
    # profiling-only step decomposition (tools/profile_step.py): disabled
    # parts are replaced by trace-time placeholder constants, so any mask
    # other than -1 yields meaningless planner RESULTS (timing only)
    PM = int(getattr(s, "profile_mask", -1))
    P_SAMP, P_NN, P_FKCC, P_BOOK, P_SOLVE = (
        bool(PM & 1), bool(PM & 2), bool(PM & 4), bool(PM & 8), bool(PM & 16)
    )
    PCP = int(getattr(s, "pc_phase", 2))  # profiling only (see rrtc.py)
    PPATH = s.max_path
    # meta lanes: in_start flag, dynamic-domain radius, parent index (f32,
    # exact for indices < 2^24; written by the insert block stores and read
    # back by the path-export walk), and the node's squared config norm
    # (precomputed so the NN scans run as |n|^2 + |q|^2 - 2 n.q with one
    # MXU dot per chunk instead of per-dimension vector ops)
    lin, lrad, lpar, lnn = dp, dp + 1, dp + 2, dp + 3
    def kernel(ctl_ref, nodes0_ref, sph_ref, cap_ref, zcap_ref, cub_ref,
               zcub_ref, bm_ref, ch_ref, pt_ref, su_ref, pcm_ref, stab_ref,
               att_ref, hfm_ref, hfd_ref, envn_ref, path_out, scal_out,
               buf_out, cvec_scr, cnt_scr, escr, rscr, gscr, nascr, gsm,
               pc_scr, pcl_scr):
        # buf_out row layout: lanes 0..d-1 = configuration, lane lin =
        # in_start flag, lane lrad = dynamic-domain radius, rest zero.
        env_refs = (sph_ref, cap_ref, zcap_ref, cub_ref, zcub_ref)
        pc_refs = (bm_ref, ch_ref, pt_ref, su_ref, pcm_ref, stab_ref,
                   att_ref, hfm_ref, hfd_ref)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        iota_ch_col = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
        row_iota_col = jax.lax.broadcasted_iota(jnp.int32, (Erow, 1), 0)

        # ------------------------- initialization -------------------------
        cvec_scr[:, :] = jnp.zeros((8, 128), jnp.float32)
        if not P_FKCC:
            cnt_scr[:, :] = jnp.full((8, 128), float(P), jnp.float32)
        # the one-hot nearest-config matmul contracts over whole node-buffer
        # chunks: uninitialized rows would poison it (0 * NaN = NaN), unlike
        # the where-masked NN scans, so zero the buffer once per problem
        buf_out[:, :] = jnp.zeros((M + 32, 128), jnp.float32)
        # node 0 = start (start tree), nodes 1..G = goals (goal tree);
        # nodes0 rows arrive with LIN/LRAD/LPAR lanes preset host-side
        # (roots are their own parents)
        for i in range(1 + G):
            buf_out[i : i + 1, :] = nodes0_ref[0, i : i + 1, :]

        n_goals = ctl_ref[0, 0, 2]
        any_direct = ctl_ref[0, 0, 1]
        sample_offset = ctl_ref[0, 0, 0]
        # sample budget is a RUNTIME scalar (reference max_iterations
        # semantics): plan and straggler-retry calls share one compiled
        # program, differing only in this value
        max_iter = ctl_ref[0, 0, 3]

        # ------------------------------ loop ------------------------------
        # carry: (iters, sample_idx, n_nodes, size_start, size_goal,
        #         a_is_start, connect, c_tip, c_rem, c_other,
        #         done, junc_a, junc_b, a_j_start, c_n, c_len)
        init = (
            jnp.int32(0),
            sample_offset + 1,
            jnp.int32(1 + G),
            jnp.int32(1),
            n_goals,
            jnp.int32(0 if s.start_tree_first else 1),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            any_direct,
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(1),
            jnp.float32(1.0),
            jnp.float32(1.0),
            jnp.int32(0),
            jnp.int32(0),
        )

        def cond(c):
            iters, _, n_nodes, *_rest = c
            connect, done = c[6], c[10]
            budget = (iters < max_iter) | (connect > 0)
            return (done == 0) & budget & (n_nodes < M)

        def body(c):
            (iters, sample_idx, n_nodes, size_start, size_goal, a_is_start,
             connect, c_tip, c_rem, c_other, done, junc_a, junc_b, a_j_start,
             c_n, c_len, n_gsteps, n_csteps) = c
            grow = connect == 0
            # interleaved cadence: the grow part runs EVERY step and the
            # connect part rides along whenever a chain is active, so the
            # per-step fixed costs are paid once instead of alternating
            do_grow = jnp.full((), True) if INTER else grow
            do_conn = connect > 0

            # --- tree balancing (rrtc.hh:100-108), chain-inactive steps only
            # (a mid-chain swap would flip the tree its inserts belong to)
            asize = jnp.where(a_is_start > 0, size_start, size_goal).astype(jnp.float32)
            bsize = jnp.where(a_is_start > 0, size_goal, size_start).astype(jnp.float32)
            ratio = jnp.abs(asize - bsize) / asize
            do_swap = grow & ((not balance) | (ratio < s.tree_ratio))
            a_is = jnp.where(do_swap, 1 - a_is_start, a_is_start)
            af = a_is.astype(jnp.float32)

            # ---- grow-only machinery under ONE branch: sampling, the
            # two NN scans, window compaction, the nearest-config
            # gather, and the connect-entry NN.  Connect steps skip all
            # of it; outputs are staged to scratch and read back below
            # (every consumer is already gated on do_grow / n_acc, and
            # n_acc is forced to 0 outside grow mode so stale staging
            # can never activate grow rows).
            @pl.when(do_grow)
            def _():
                # --- KW Halton samples, scaled to joint limits: SAMP — computed
                # in ROW layout, lane = sample index (see _halton_rows).  Lanes
                # past KW hold out-of-window samples nothing reads: the NN uses
                # the first KW lanes, and the one-hot compaction never selects a
                # rank past K (ranks only accrue on live lanes).
                if P_SAMP:
                    idx_row = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) + sample_idx
                    )
                    urows = _halton_rows(spec, idx_row)
                    srows = [u * spans[j] + lows[j] for j, u in enumerate(urows)]
                else:
                    srows = [
                        jnp.zeros((1, 128), jnp.float32)
                        + sample_idx.astype(jnp.float32) * 1e-8
                        for _ in range(d)
                    ]
                srows += [jnp.zeros((1, 128), jnp.float32)] * (dp - d)
                sampH = jnp.concatenate(srows, axis=0)     # (dp, 128) dim-major

                # --- NN of samples against tree_a, chunked over the live tree
                # prefix (ceil(n_nodes/CH) chunks instead of the full M-row
                # buffer; tie-break = smallest node index, exactly the full-scan
                # semantics because chunks combine with strict <).  Skipped
                # entirely (0 chunks) in connect mode — samples are unused there.
                qrows_a = [srows[j][:, :KW] for j in range(d)]
                # squared sample norms for the dot-form NN (see lnn lane)
                s2_row = jnp.zeros((1, 128), jnp.float32)
                for j in range(d):
                    s2_row = s2_row + srows[j] * srows[j]
                s2a = s2_row[:, :KW]
                sampB = sampH[:, :KW]                          # (dp, KW)

                def nn_a_chunk(cidx, carry):
                    bd, bi, br = carry                        # (1, KW) f32 each
                    base = cidx * CH
                    rows = buf_out[pl.ds(base, CH), :]        # (CH, 128)
                    ins_c = rows[:, lin : lin + 1]            # (CH, 1)
                    rad_c = rows[:, lrad : lrad + 1]          # (CH, 1)
                    gidx = iota_ch_col + base                 # (CH, 1)
                    mask = (gidx < n_nodes) & (ins_c == af)
                    dots = _dotx(rows[:, 0:dp], sampB)        # (CH, KW)
                    d2 = rows[:, lnn : lnn + 1] + s2a - 2.0 * dots
                    d2m = jnp.where(mask, d2, _BIG)
                    mn_c = jnp.min(d2m, axis=0, keepdims=True)
                    gidx_b = jnp.broadcast_to(gidx, (CH, KW))
                    near_c = jnp.min(
                        jnp.where(d2m <= mn_c, gidx_b, 10**9), axis=0, keepdims=True
                    )
                    is_n = gidx_b == jnp.broadcast_to(near_c, (CH, KW))
                    nrad_c = jnp.max(
                        jnp.where(is_n, jnp.broadcast_to(rad_c, (CH, KW)), -_BIG),
                        axis=0, keepdims=True,
                    )
                    better = mn_c < bd
                    return (
                        jnp.where(better, mn_c, bd),
                        jnp.where(better, near_c.astype(jnp.float32), bi),
                        jnp.where(better, nrad_c, br),
                    )

                nch = jnp.where(do_grow, (n_nodes + CH - 1) // CH, 0)
                if P_NN:
                    bd_a, nearest_row, nrad_row = jax.lax.fori_loop(
                        0, nch,
                        nn_a_chunk,
                        (
                            jnp.full((1, KW), _BIG, jnp.float32),
                            jnp.zeros((1, KW), jnp.float32),
                            jnp.zeros((1, KW), jnp.float32),
                        ),
                    )
                else:
                    bd_a = jnp.full((1, KW), 0.25, jnp.float32) + sampH[0, 0] * 0.0
                    nearest_row = jnp.zeros((1, KW), jnp.float32)
                    nrad_row = jnp.full((1, KW), _BIG, jnp.float32)
                ndist_row = jnp.sqrt(jnp.maximum(bd_a, 0.0))

                # --- dynamic-domain window prefilter (rrtc.hh:123-126)
                live_lane = lane128 < KW
                pad = lambda rowv: jnp.pad(rowv, ((0, 0), (0, 128 - KW))) if KW < 128 else rowv
                ndist128 = pad(ndist_row)
                nrad128 = pad(nrad_row)
                if dyn:
                    dd_skip = nrad128 < ndist128
                else:
                    dd_skip = jnp.zeros((1, 128), bool)
                chosen = (~dd_skip) & live_lane
                rank = _lane_cumsum(chosen.astype(jnp.float32))   # (1,128) inclusive
                chosen = chosen & (rank <= K)
                n_acc = jnp.int32(jnp.sum(chosen.astype(jnp.float32)))
                nth = chosen & (rank == K)
                first_nth = jnp.int32(jnp.min(jnp.where(nth, lane128, 10**9)))
                consumed = jnp.where(first_nth < 10**9, first_nth + 1, jnp.int32(KW))

                # --- compact the <=K chosen samples to edge rows 0..K-1
                rank_b = jnp.broadcast_to(rank, (Erow, 128))
                chosen_b = jnp.broadcast_to(chosen, (Erow, 128))
                krow_col = jax.lax.broadcasted_iota(jnp.int32, (Erow, 128), 0)
                sel = (chosen_b & (rank_b == (krow_col + 1).astype(jnp.float32))).astype(
                    jnp.float32
                )                                                  # (Erow, 128)
                # contract sel's lane dim against sampH's lane dim (the MXU's
                # rhs-transposed mode): avoids materializing a (128, dp) sample
                # matrix from the row-layout Halton values
                samp_sel = jax.lax.dot_general(
                    sel, sampH, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )                                                  # (Erow, dp)
                near_idx_col = _dotx(sel, _row_to_col(pad(nearest_row), 128))                                                  # (Erow, 1)
                ndist_col = _dotx(sel, _row_to_col(ndist128, 128))

                # gather the K nearest-node configs with ONE chunked one-hot MXU
                # matmul over the live tree prefix (K serial dynamic-sublane row
                # reads each pay fixed VMEM-access latency; the matmul reads the
                # same chunk rows the NN scan just touched).  Rows K..Erow-1 hold
                # whatever their (unchosen) sel row selects — every consumer
                # masks them with is_grow_row/live_row.
                escr[:, 0:1] = near_idx_col

                def gather_chunk(cidx, acc):
                    base = cidx * CH
                    rows = buf_out[pl.ds(base, CH), :]            # (CH, 128)
                    gidx = (
                        jax.lax.broadcasted_iota(jnp.int32, (Erow, CH), 1) + base
                    ).astype(jnp.float32)
                    oh = (gidx == jnp.broadcast_to(near_idx_col, (Erow, CH))).astype(
                        jnp.float32
                    )
                    return acc + _dotx(oh, rows)

                if P_NN:
                    # hybrid gather: the one-hot matmul costs one chunk trip
                    # per CH rows (it re-reads the rows the NN scan just
                    # touched), which beats K serial dynamic row reads for
                    # SMALL trees but loses linearly for big ones (a 16k-node
                    # straggler tree is ~128 trips).  Past a few chunks,
                    # switch to K dynamic single-row reads of the nearest
                    # indices (rows are exact either way; rows K..Erow-1 are
                    # dead in both paths and masked by every consumer).
                    def gather_small():
                        return jax.lax.fori_loop(
                            0, nch, gather_chunk,
                            jnp.zeros((Erow, 128), jnp.float32),
                        )

                    def gather_big():
                        rows = [
                            buf_out[pl.ds(jnp.int32(escr[k, 0]), 1), :]
                            for k in range(K)
                        ]
                        rows.append(jnp.zeros((Erow - K, 128), jnp.float32))
                        return jnp.concatenate(rows, axis=0)

                    near_all = jax.lax.cond(nch > 2, gather_big, gather_small)
                else:
                    near_all = jnp.zeros((Erow, 128), jnp.float32) + near_idx_col * 0.0
                near_cfg = near_all[:, 0:dp]

                reach = ndist_col < rng
                scale = jnp.where(reach, 1.0, rng / jnp.maximum(ndist_col, 1e-12))
                vec = (samp_sel - near_cfg) * scale               # (Erow, dp)
                ext_dist = jnp.minimum(ndist_col, rng)
                new_cfg = near_cfg + vec
                n_col = jnp.maximum(jnp.ceil(ext_dist * res8), 1.0)

                # --- connect-entry NN: new grow nodes vs tree_b (chunked, as
                # above; only needed in grow mode)
                q2_col = jnp.sum(new_cfg * new_cfg, axis=1, keepdims=True)
                q2_row = _col_to_row(q2_col, Erow)             # (1, Erow)

                def nn_b_chunk(cidx, carry):
                    bd, bi = carry                            # (1, Erow) f32
                    base = cidx * CH
                    rows = buf_out[pl.ds(base, CH), :]
                    ins_c = rows[:, lin : lin + 1]
                    gidx = iota_ch_col + base
                    mask = (gidx < n_nodes) & (ins_c != af)
                    dots = jax.lax.dot_general(
                        rows[:, 0:dp], new_cfg, (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )                                          # (CH, Erow)
                    d2 = rows[:, lnn : lnn + 1] + q2_row - 2.0 * dots
                    d2m = jnp.where(mask, d2, _BIG)
                    mn_c = jnp.min(d2m, axis=0, keepdims=True)
                    gidx_b = jnp.broadcast_to(gidx, (CH, Erow))
                    near_c = jnp.min(
                        jnp.where(d2m <= mn_c, gidx_b, 10**9), axis=0, keepdims=True
                    )
                    better = mn_c < bd
                    return (
                        jnp.where(better, mn_c, bd),
                        jnp.where(better, near_c.astype(jnp.float32), bi),
                    )

                if P_NN:
                    bd_b, oidx_row = jax.lax.fori_loop(
                        0, nch,
                        nn_b_chunk,
                        (
                            jnp.full((1, Erow), _BIG, jnp.float32),
                            jnp.zeros((1, Erow), jnp.float32),
                        ),
                    )
                else:
                    bd_b = jnp.full((1, Erow), 1.0, jnp.float32) + new_cfg[0, 0] * 0.0
                    oidx_row = jnp.zeros((1, Erow), jnp.float32)
                od_row = jnp.sqrt(jnp.maximum(bd_b, 0.0))

                nrad_col = _dotx(sel, _row_to_col(nrad128, 128))
                # ---- stage for the shared tail
                gscr[:, 0:dp] = near_cfg
                gscr[:, dp : 2 * dp] = vec
                gscr[:, 2 * dp : 2 * dp + 1] = n_col
                gscr[:, 2 * dp + 1 : 2 * dp + 2] = nrad_col
                gscr[:, 2 * dp + 2 : 2 * dp + 3] = near_idx_col
                gscr[:, 2 * dp + 3 : 2 * dp + 4] = q2_col
                nascr[:, :] = near_all
                rscr[0:1, 0:Erow] = oidx_row
                rscr[1:2, 0:Erow] = od_row
                gsm[0, 0] = consumed
                gsm[0, 1] = n_acc

            g1 = gscr[:, :]
            near_cfg = g1[:, 0:dp]
            vec = g1[:, dp : 2 * dp]
            n_col = g1[:, 2 * dp : 2 * dp + 1]
            nrad_col = g1[:, 2 * dp + 1 : 2 * dp + 2]
            near_idx_col = g1[:, 2 * dp + 2 : 2 * dp + 3]
            q2_col = g1[:, 2 * dp + 3 : 2 * dp + 4]
            near_all = nascr[:, :]
            new_cfg = near_cfg + vec
            oidx_row = rscr[0:1, 0:Erow]
            od_row = rscr[1:2, 0:Erow]
            consumed = gsm[0, 0]
            n_acc = jnp.where(do_grow, gsm[0, 1], 0)

            # --- connect-edge params (rows C0..C0+C-1): tip + inc*(seg + frac)
            tip128 = jnp.where(
                lane128 < lin, buf_out[pl.ds(c_tip, 1), :], 0.0
            )                                                  # (1, 128)
            tip_row = tip128[:, 0:dp]                          # (1, dp)
            inc128 = cvec_scr[0:1, :]
            inc_row = inc128[:, 0:dp]
            cseg = jnp.maximum(row_iota_col - C0, 0).astype(jnp.float32)
            is_grow_row = row_iota_col < K
            en = jnp.where(is_grow_row, near_cfg, tip_row + inc_row * cseg)
            ev = jnp.where(is_grow_row, vec, jnp.broadcast_to(inc_row, (Erow, dp)))
            n_all = jnp.where(is_grow_row, n_col, c_n)         # (Erow, 1)
            # Stale-row clamp: rows beyond the live edge set (grow rows past
            # n_acc, connect rows past the remaining segments) otherwise
            # interpolate from garbage configs, sweeping wide arcs that defeat
            # the pointcloud/heightfield gating every step.  Pin them to the
            # connect tip (always a real tree node) with a zero vector so
            # their FK lands on already-gated positions.
            live_row = (is_grow_row & (row_iota_col < n_acc)) | (
                (~is_grow_row) & (row_iota_col >= C0)
                & ((row_iota_col - C0) < jnp.minimum(C, c_rem))
            )
            en = jnp.where(live_row, en, tip_row)
            ev = jnp.where(live_row, ev, 0.0)
            n_all = jnp.where(live_row, n_all, 1.0)

            # --- fused FK+CC over all E edges' interpolation grids
            jp1 = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) % P + 1).astype(
                jnp.float32
            )
            ohl = (
                jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1) // P
                == jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            ).astype(jnp.float32)                              # (R, 128) static
            for t in range(NT):
                # tiles are mode-pure (connect rows start at C0, a tile
                # boundary): evaluate only the active mode's tiles
                t_active = do_grow if (t * EPT) < K else do_conn
                if not P_FKCC:
                    t_active = t_active & False

                @pl.when(t_active)
                def _(t=t):
                    def rowslice(a, j):
                        parts = [
                            a[t * EPT + g * 8 : t * EPT + g * 8 + 8, j : j + 1]
                            for g in range(R)
                        ]
                        return jnp.concatenate(parts, axis=1)      # (8, R)

                    n_p = rowslice(jnp.broadcast_to(n_all, (Erow, dp)), 0)  # (8, R)
                    n_tile = _dotx(n_p, ohl)
                    # stale-edge lane mask: rows K..EPT-1 of a grow tile (and
                    # connect rows past c_rem) are pinned to the connect tip,
                    # a tree node often near obstacles — without the mask
                    # they flag pointcloud spheres into the exact scan on
                    # every step for lanes nobody reads
                    lv_p = rowslice(
                        jnp.broadcast_to(
                            live_row.astype(jnp.float32), (Erow, dp)
                        ), 0,
                    )
                    lane_live = _dotx(lv_p, ohl) > 0.5
                    frac = jnp.minimum(jp1 / (8.0 * n_tile), 1.0)
                    q_rows = []
                    for j in range(d):
                        a_t = _dotx(rowslice(en, j), ohl)
                        b_t = _dotx(rowslice(ev, j), ohl)
                        q_rows.append(a_t + b_t * frac)
                    vmin = tile_vmin(
                        spec, counts, env_refs, q_rows, pc_refs=pc_refs,
                        pc_scratch=pc_scr, pc_phase=PCP, pc_list=pcl_scr,
                        lane_mask=lane_live,
                        env_live=tuple(envn_ref[0, 0, i] for i in range(5)),
                    )
                    okf = (vmin >= 0.0).astype(jnp.float32)
                    cnts = _dotx(okf, jnp.transpose(ohl))  # (8, R)
                    cnt_scr[:, t * R : (t + 1) * R] = cnts

            # =================== vectorized bookkeeping =====================
            # The per-edge insert/dd/candidate logic runs in the VECTOR
            # domain: validity flags are extracted from the count tile with
            # one masked matmul, insert ranks and the connect prefix come
            # from one lower-triangular cumsum matmul, and the inserted rows
            # are compacted by a one-hot matmul and written with ONE
            # contiguous block store per mode.  (The previous per-edge
            # scalar loop — ~90 VMEM scalar reads + ~50 dynamic single-row
            # writes — was the largest per-step cost at ~4.8 µs.)  Only the
            # dynamic-domain radius writes stay scalar-addressed (arbitrary
            # target rows).  Parent indices live in node-row lane `lpar`,
            # written as part of the same block stores.

            # per-edge validity from the (8, NT*R) count tile: row e of
            # sub_sel @ cnt picks sublane e%8; the column mask picks the
            # edge's tile column t*R+g
            e_i0 = jax.lax.broadcasted_iota(jnp.int32, (Erow, 8), 0)
            e_i1 = jax.lax.broadcasted_iota(jnp.int32, (Erow, 8), 1)
            sub_sel = ((e_i0 % 8) == e_i1).astype(jnp.float32)
            c_i0 = jax.lax.broadcasted_iota(jnp.int32, (Erow, 128), 0)
            c_i1 = jax.lax.broadcasted_iota(jnp.int32, (Erow, 128), 1)
            col_of_e = (c_i0 // EPT) * R + (c_i0 % EPT) // 8
            colmask = c_i1 == col_of_e
            cntA = _dotx(sub_sel, cnt_scr[:, :])               # (Erow, 128)
            cnt_col = jnp.sum(
                jnp.where(colmask, cntA, 0.0), axis=1, keepdims=True
            )
            ok_col = cnt_col == float(P)                       # (Erow, 1)

            # connect prefix (edges C0..C0+C-1): cumprod of binary flags ==
            # (inclusive cumsum == local position + 1)
            attempted_c = jnp.minimum(C, c_rem)
            if not P_BOOK:
                attempted_c = attempted_c * 0
            n_acc_eff = jnp.where(do_grow, n_acc, 0)
            if not P_BOOK:
                n_acc_eff = n_acc_eff * 0
            is_conn_row = row_iota_col >= C0
            eff_col = (
                is_conn_row & ((row_iota_col - C0) < jnp.where(do_conn, attempted_c, 0))
                & ok_col
            ).astype(jnp.float32)
            ins0_col = (is_grow_row & (row_iota_col < n_acc_eff) & ok_col).astype(
                jnp.float32
            )
            lt_i0 = jax.lax.broadcasted_iota(jnp.int32, (Erow, Erow), 0)
            lt_i1 = jax.lax.broadcasted_iota(jnp.int32, (Erow, Erow), 1)
            LT = (lt_i1 <= lt_i0).astype(jnp.float32)
            cums = _dotx(LT, jnp.concatenate([ins0_col, eff_col], axis=1))
            rank_col, cume_col = cums[:, 0:1], cums[:, 1:2]
            advancing_col = (eff_col > 0.0) & (
                cume_col == (row_iota_col - C0 + 1).astype(jnp.float32)
            )
            prefix = jnp.int32(jnp.sum(advancing_col.astype(jnp.float32)))
            room_c = jnp.maximum(M - n_nodes, 0)
            c_ins = jnp.minimum(prefix, room_c)

            # connect insert rows ci=0..C-1 at positions n_nodes+ci: one
            # (8, 128) tile (row ci = tip + inc*(ci+1) with meta lanes set),
            # rows past c_ins zeroed, ONE dynamic block store
            sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            sub8f = sub8.astype(jnp.float32)
            nn_f = n_nodes.astype(jnp.float32)
            crows = tip128 + inc128 * (sub8f + 1.0)
            cpar = jnp.where(sub8 == 0, c_tip.astype(jnp.float32), nn_f + sub8f - 1.0)
            cn2 = jnp.sum(
                jnp.where(lane128 < dp, crows * crows, 0.0),
                axis=1, keepdims=True,
            )                                              # (8, 1)
            crows = jnp.where(
                lane128 == lin, af,
                jnp.where(lane128 == lrad, _BIG,
                          jnp.where(lane128 == lpar, cpar,
                                    jnp.where(lane128 == lnn, cn2, crows))),
            )
            crows = jnp.where(sub8 < c_ins, crows, 0.0)

            @pl.when(do_conn & (attempted_c > 0))
            def _():
                buf_out[pl.ds(n_nodes, 8), :] = crows

            # grow insert rows: compact the inserted edges to ranks 0..n_ins-1
            # with a one-hot matmul, ONE dynamic block store at the base
            gbase = n_nodes + c_ins
            ins_col = (ins0_col > 0.0) & (
                gbase + rank_col.astype(jnp.int32) - 1 < M
            )
            insf_col = ins_col.astype(jnp.float32)
            n_ins = jnp.int32(jnp.sum(insf_col))
            new128 = jnp.pad(new_cfg, ((0, 0), (0, 128 - dp)))
            NEW = jnp.where(
                lane128 == lin, af,
                jnp.where(lane128 == lrad, _BIG,
                          jnp.where(lane128 == lpar,
                                    jnp.broadcast_to(near_idx_col, (Erow, 128)),
                                    jnp.where(lane128 == lnn,
                                              jnp.broadcast_to(q2_col, (Erow, 128)),
                                              new128))),
            )
            selrank_col = jnp.where(ins_col, rank_col, 0.0)
            selrank_row = _col_to_row(selrank_col, Erow)       # (1, Erow)
            KB = max(8 * ((K + 7) // 8), 8)
            kb_i0 = jax.lax.broadcasted_iota(jnp.int32, (KB, Erow), 0)
            selins = (
                jnp.broadcast_to(selrank_row, (KB, Erow))
                == (kb_i0 + 1).astype(jnp.float32)
            ).astype(jnp.float32)
            comp = _dotx(selins, NEW)                          # (KB, 128)

            @pl.when(do_grow & (n_acc_eff > 0))
            def _():
                buf_out[pl.ds(gbase, KB), :] = comp

            # dynamic-domain radius updates: new radii from the PRE-step
            # nearest radii (vector), written back as full pre-gathered rows
            # (near_all) with only the radius lane replaced — K dynamic
            # single-row stores (arbitrary rows; the one inherently
            # scattered write left)
            if dyn:
                inf_r = nrad_col > _BIG * 0.5
                ok_upd = jnp.where(inf_r, nrad_col, nrad_col * (1.0 + s.alpha))
                fail_upd = jnp.where(
                    inf_r,
                    jnp.float32(s.radius),
                    jnp.maximum(nrad_col * (1.0 - s.alpha), s.min_radius),
                )
                newr_col = jnp.where(ok_col, ok_upd, fail_upd)
                dd_rows = jnp.where(
                    lane128 == lrad, jnp.broadcast_to(newr_col, (Erow, 128)),
                    near_all,
                )
                # escr[:, 0] already holds near_idx_col (staged for the
                # one-hot config gather above)
                for k in range(K):
                    attempted = do_grow & (k < n_acc_eff)

                    @pl.when(attempted)
                    def _(k=k):
                        nidx = jnp.int32(escr[k, 0])
                        buf_out[pl.ds(nidx, 1), :] = dd_rows[k : k + 1, :]

            # most promising inserted node for connect entry: min over the
            # other-tree distances of inserted edges, tie-break = lowest edge
            ins_row = selrank_row > 0.5                        # (1, Erow)
            odm = jnp.where(ins_row, od_row, _BIG)
            best_od = jnp.min(odm)
            lane_er = jax.lax.broadcasted_iota(jnp.int32, (1, Erow), 1)
            best_lane = jnp.min(jnp.where(odm == best_od, lane_er, 10**9))
            onehot = (lane_er == best_lane).astype(jnp.float32)
            best_other = jnp.int32(jnp.sum(onehot * oidx_row))
            best_pos = gbase + jnp.int32(jnp.sum(onehot * selrank_row)) - 1
            best_tip = _dotx(onehot, new128)                   # (1, 128)
            any_ins = n_ins

            n_ins_total = n_ins + c_ins  # modes are exclusive unless INTER
            n_nodes_new = n_nodes + n_ins_total
            size_start_new = size_start + jnp.where(a_is > 0, n_ins_total, 0)
            size_goal_new = size_goal + jnp.where(a_is > 0, 0, n_ins_total)

            # --- connect state machine (mirrors rrtc.py step tail)
            fail_chain = do_conn & (prefix < attempted_c)
            chain_ok = do_conn & (~fail_chain) & (c_ins == prefix)
            rem_chain = c_rem - prefix
            chain_joined = chain_ok & (rem_chain == 0)
            chain_still = chain_ok & (rem_chain > 0)
            # a new chain may only start once the previous one has resolved
            # (failed, or absent); under INTER both parts ran this step
            enter = (
                do_grow & (any_ins > 0) & (~chain_still) & (~chain_joined)
            )
            safe_od = jnp.minimum(best_od, jnp.float32(1e12))
            n_ext = jnp.int32(jnp.ceil(safe_od / rng))
            n_ext_f = jnp.maximum(n_ext.astype(jnp.float32), 1.0)
            other_cfg = jnp.where(
                lane128 < lin, buf_out[pl.ds(best_other, 1), :], 0.0
            )
            inc_new = (other_cfg - best_tip) / n_ext_f
            inc_len_new = safe_od / n_ext_f

            tip_after = jnp.where(
                enter,
                best_pos,
                jnp.where(chain_ok & (prefix > 0), n_nodes + prefix - 1, c_tip),
            )
            remaining_after = jnp.where(
                enter, n_ext, jnp.where(do_conn, rem_chain, 0)
            )

            joined = ((enter & (n_ext == 0)) | chain_joined) & (done == 0)
            if not P_SOLVE:
                joined = joined & False
            connect_next = (
                ((enter & (n_ext > 0)) | chain_still)
                & (~joined)
                & (n_nodes_new < M)
            )

            @pl.when(enter)
            def _():
                cvec_scr[0:1, :] = inc_new

            done_new = jnp.where(joined, 1, done)
            junc_a_new = jnp.where(joined, tip_after, junc_a)
            junc_b_new = jnp.where(
                joined, jnp.where(enter, best_other, c_other), junc_b
            )
            a_j_new = jnp.where(joined, a_is, a_j_start)
            c_len_new = jnp.where(enter, inc_len_new, c_len)
            c_n_new = jnp.where(
                enter, jnp.maximum(jnp.ceil(inc_len_new * res8), 1.0), c_n
            )

            return (
                iters + jnp.where(do_grow, consumed, 0),
                sample_idx + jnp.where(do_grow, consumed, 0),
                n_nodes_new,
                size_start_new,
                size_goal_new,
                a_is,
                connect_next.astype(jnp.int32),
                tip_after,
                remaining_after,
                jnp.where(enter, best_other, c_other),
                done_new,
                junc_a_new,
                junc_b_new,
                a_j_new,
                c_n_new,
                c_len_new,
                n_gsteps + do_grow.astype(jnp.int32),
                n_csteps + do_conn.astype(jnp.int32),
            )

        final = jax.lax.while_loop(cond, body, init)
        (iters, sample_idx, n_nodes, size_start, size_goal, _a, _c, _t, _r,
         _o, done, junc_a, junc_b, a_j_start, _cn, _cl, n_gsteps,
         n_csteps) = final

        scal_out[0, 0, 0] = done
        scal_out[0, 0, 1] = junc_a
        scal_out[0, 0, 2] = junc_b
        scal_out[0, 0, 3] = a_j_start
        scal_out[0, 0, 4] = iters
        scal_out[0, 0, 5] = sample_idx - 1
        scal_out[0, 0, 6] = n_nodes
        scal_out[0, 0, 7] = size_start
        scal_out[0, 0, 8] = size_goal
        scal_out[0, 0, 9] = n_gsteps
        scal_out[0, 0, 10] = n_csteps

        # --- path export: walk both parent chains and write the node rows
        # directly into the (PP, 128) path output, at exactly the positions
        # rrtc._recover_path scatters to (chain A root..junction at rows
        # 0..la-1, chain B junction..root at rows la..la+lb-1); reversal,
        # direct overrides, and tail padding stay in the XLA finalizer.
        # Exporting ~la+lb rows replaces DMA-ing the whole (M, 128) node
        # buffer per problem, which dominated both HBM footprint
        # (B*M*128*4 bytes) and the result-gather phase.
        def parent_of(row128):
            # parent index lives in lane lpar of the node row (f32, exact)
            return jnp.int32(
                jnp.sum(jnp.where(lane128 == lpar, row128, 0.0))
            )

        def walk_len(junc):
            # mirror rrtc._walk: cap at max_path, length = first root hit + 1
            def body(i, carry):
                cur, length = carry
                par = parent_of(buf_out[pl.ds(cur, 1), :])
                at_root = par == cur
                length = jnp.where((length < 0) & at_root, i + 1, length)
                return par, length

            _, L = jax.lax.fori_loop(
                0, PPATH, body, (junc, jnp.int32(-1))
            )
            return jnp.maximum(L, 1)

        la = walk_len(junc_a)
        lb = walk_len(junc_b)

        def copy_a(k, cur):
            row = buf_out[pl.ds(cur, 1), :]
            path_out[pl.ds(la - 1 - k, 1), :] = row
            return parent_of(row)

        jax.lax.fori_loop(0, la, copy_a, junc_a)

        def copy_b(k, cur):
            row = buf_out[pl.ds(cur, 1), :]

            @pl.when(la + k < PPATH)
            def _():
                path_out[pl.ds(la + k, 1), :] = row

            return parent_of(row)

        jax.lax.fori_loop(0, lb, copy_b, junc_b)
        scal_out[0, 0, 11] = la
        scal_out[0, 0, 12] = lb

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 18, 19))
def _run_mega(spec, settings, ctl, nodes0, sph, cap, zcap, cub, zcub,
              bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags, interpret):
    from vamp_mvt_tpu.collision.pc_kernel import MAX_CLASSES

    has_pc, has_att, has_hf = flags
    B, n0, _ = nodes0.shape
    G = n0 - 1
    cfg = _kernel_config(spec, settings, G)
    counts = {
        "spheres": sph.shape[-2],
        "capsules": cap.shape[-2],
        "z_capsules": zcap.shape[-2],
        "cuboids": cub.shape[-2],
        "z_cuboids": zcub.shape[-2],
        "pc_chunks": ch.shape[-2] if has_pc else 0,
        "pc_rrows": (bm.shape[-2] // (2 * MAX_CLASSES)) if has_pc else 0,
        "attach": att.shape[-2] if has_att else 0,
        "heightfields": hfm.shape[-2] if has_hf else 0,
        "hf_rows": (hfd.shape[-2] // hfm.shape[-2]) if has_hf else 0,
    }
    kernel = _make_mega_kernel(spec, settings, counts, cfg)
    M = cfg["M"]
    envn = _live_counts(sph, cap, zcap, cub, zcub)
    sph, cap, zcap, cub, zcub = (
        _pad_rows(a) for a in (sph, cap, zcap, cub, zcub)
    )

    def smem_spec(n, f):
        return pl.BlockSpec((1, n, f), lambda b: (b, 0, 0), memory_space=pltpu.SMEM)

    PP = cfg["PP"]
    out_shapes = (
        jax.ShapeDtypeStruct((B, PP, 128), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, 16), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((None, PP, 128), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 16), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            smem_spec(1, 8),
            pl.BlockSpec((1, n0, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            smem_spec(max(counts["spheres"], 1), 4),
            smem_spec(max(counts["capsules"], 1), 8),
            smem_spec(max(counts["z_capsules"], 1), 8),
            smem_spec(max(counts["cuboids"], 1), 15),
            smem_spec(max(counts["z_cuboids"], 1), 15),
            pl.BlockSpec((None, bm.shape[-2], 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            smem_spec(ch.shape[-2], 8),
            smem_spec(pt.shape[-2], pt.shape[-1]),
            pl.BlockSpec((None, su.shape[-2], 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            smem_spec(1, 8),
            smem_spec(stab.shape[-2], stab.shape[-1]),
            smem_spec(att.shape[-2], 4),
            smem_spec(hfm.shape[-2], 10),
            pl.BlockSpec((None, hfd.shape[-2], 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            smem_spec(1, 8),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            # node buffer (configs + meta lanes incl. parent); +32 rows so
            # the fixed-width insert block stores never clip at capacity
            pltpu.VMEM((M + 32, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),    # cvec: connect increment
            pltpu.VMEM((8, 128), jnp.float32),    # cnt: per-edge valid counts
            pltpu.VMEM((cfg["Erow"], 128), jnp.float32),  # escr: per-edge scalars
            pltpu.VMEM((8, 128), jnp.float32),    # rscr: per-edge rows (oidx, od)
            pltpu.VMEM((cfg["Erow"], 128), jnp.float32),  # gscr: staged grow values
            pltpu.VMEM((cfg["Erow"], 128), jnp.float32),  # nascr: staged near_all
            pltpu.SMEM((1, 4), jnp.int32),        # gsm: consumed, n_acc
            pltpu.VMEM(
                (max((spec.n_spheres + counts["attach"]) * 24, 8), 128),
                jnp.float32,
            ),  # staged sphere centers (pointcloud / heightfield loops)
            pltpu.SMEM((1, max(counts["pc_chunks"], 1)), jnp.int32),
        ],
        interpret=interpret,
    )(ctl, nodes0, sph, cap, zcap, cub, zcub, bm, ch, pt, su, pcm, stab,
      att, hfm, hfd, envn)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _finalize_mega(spec, settings, paths, scal, starts, goals,
                   any_direct, first_direct):
    """Direct overrides + path reversal/padding, vmapped over problems (XLA).

    The parent-chain walk happens IN the kernel (rows 0..la-1 = chain A
    root..junction, la..la+lb-1 = chain B junction..root); rows past
    la+lb hold garbage and are masked here exactly as the old scatter did."""
    P = settings.max_path
    d = spec.dimension

    def one(path_b, sc_b, start, goal_set, adirect, fdirect):
        solved = sc_b[0] > 0
        a_j = sc_b[3]
        la, lb = sc_b[11], sc_b[12]
        total = la + lb
        k = jnp.arange(P)
        path = path_b[:P, :d]

        def rev(p):
            flipped = jnp.flip(p, axis=0)
            return jnp.roll(flipped, total - P, axis=0)

        path = jnp.where(a_j > 0, path, rev(path))
        last = path[jnp.maximum(total - 1, 0)]
        path = jnp.where((k < total)[:, None], path, last[None, :])

        dgoal = goal_set[fdirect]
        dpath = jnp.where((k == 0)[:, None], start[None, :], dgoal[None, :])
        path = jnp.where(adirect, dpath, path)
        total = jnp.where(adirect, 2, total)
        seg = path[1:] - path[:-1]
        lens = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
        cost = jnp.sum(jnp.where(k[1:] < total, lens, 0.0))
        solved = solved | adirect
        return RRTCResult(
            solved=solved,
            path=path,
            path_length=jnp.where(solved, total, 0),
            cost=jnp.where(solved, cost, _INF),
            iterations=sc_b[4],
            size_start=sc_b[7],
            size_goal=sc_b[8],
            sample_count=sc_b[5],
        )

    return jax.vmap(one)(
        paths, scal[:, 0], starts, goals, any_direct, first_direct
    )


def mega_inputs(spec, envs, starts, goals, goal_masks, settings,
                sample_offsets=None, budget=None):
    """Kernel control word + initial node rows for _run_mega.

    Shared by plan_batch_mega and the profiling tools so the node-row meta
    lane layout (in_start / dd radius / parent / squared norm) cannot drift
    between them (tools/profile_mega once hand-rolled nodes0 and silently
    lost the parent and norm lanes after a layout change, producing planner
    statistics from garbage NN distances).
    Returns (ctl, nodes0, any_direct, first_direct)."""
    B, d = starts.shape
    G = goals.shape[1]
    dp = max(8, 8 * ((d + 7) // 8))
    if sample_offsets is None:
        sample_offsets = jnp.zeros(B, jnp.int32)

    # --- straight-line direct-goal check (rrtc.hh:60-73), plain XLA
    span = float(np.linalg.norm(spec.limits_high - spec.limits_low))
    direct_points = validate_mod.n_points_bound(spec, span)
    direct = jax.vmap(
        lambda e, st, g, m: validate_mod.validate_motion_batch(
            spec, e, jnp.broadcast_to(st, (G, d)), g, direct_points
        )
        & m
    )(envs, starts, goals, goal_masks)
    any_direct = jnp.any(direct, axis=1)
    first_direct = jnp.argmax(direct, axis=1)

    # --- kernel inputs: (B, 1+G, 128) node rows with LIN/LRAD/LPAR/LNN
    # lanes preset (roots are their own parents)
    far = jnp.where(goal_masks[..., None], 0.0, 1e8)
    nodes0 = jnp.concatenate([starts[:, None], goals + far], axis=1)  # (B,1+G,d)
    nodes0 = jnp.concatenate(
        [nodes0, jnp.zeros((B, 1 + G, 128 - d), jnp.float32)], axis=2
    )
    lanei = jnp.arange(128)
    in_start = (jnp.arange(1 + G) == 0).astype(jnp.float32)  # (1+G,)
    self_par = jnp.arange(1 + G, dtype=jnp.float32)          # roots: own parent
    root_n2 = jnp.sum(
        jnp.where(lanei[None, None] < d, nodes0, 0.0) ** 2, axis=2, keepdims=True
    )                                                        # (B, 1+G, 1)
    nodes0 = jnp.where(
        lanei[None, None] == dp, in_start[None, :, None],
        jnp.where(
            lanei[None, None] == dp + 1, _BIG,
            jnp.where(
                lanei[None, None] == dp + 2, self_par[None, :, None],
                jnp.where(lanei[None, None] == dp + 3, root_n2, nodes0),
            ),
        ),
    )
    if budget is None:
        budget = settings.max_iterations
    ctl = jnp.zeros((B, 1, 8), jnp.int32)
    ctl = ctl.at[:, 0, 0].set(jnp.asarray(sample_offsets, jnp.int32))
    ctl = ctl.at[:, 0, 1].set(any_direct.astype(jnp.int32))
    ctl = ctl.at[:, 0, 2].set(jnp.sum(goal_masks.astype(jnp.int32), axis=1))
    ctl = ctl.at[:, 0, 3].set(
        jnp.broadcast_to(jnp.asarray(budget, jnp.int32), (B,))
    )
    return ctl, nodes0, any_direct, first_direct


def plan_batch_mega(
    spec: RobotSpec,
    envs: Environment,
    starts: jnp.ndarray,            # (B, d)
    goals: jnp.ndarray,             # (B, G, d)
    goal_masks: jnp.ndarray,        # (B, G)
    settings: RRTCSettings,
    sample_offsets: jnp.ndarray | None = None,
    interpret: bool | None = None,
    budget: jnp.ndarray | int | None = None,
) -> RRTCResult:
    """Solve a batch with the planner megakernel (one grid step per problem).

    Equivalent in planner semantics to rrtc.plan_batch; orders of magnitude
    faster on TPU because finished problems stop instantly and all state is
    chip-resident.  On CPU backends runs in Pallas interpreter mode (slow;
    tests only).

    budget overrides settings.max_iterations AT RUNTIME (scalar or (B,)):
    a straggler retry at 32x budget reuses the exact compiled program of the
    initial call instead of compiling a second megakernel.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ctl, nodes0, any_direct, first_direct = mega_inputs(
        spec, envs, starts, goals, goal_masks, settings, sample_offsets,
        budget,
    )

    from vamp_mvt_tpu.ops.kernels.fkcc_pallas import _pc_arrays

    bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags = _pc_arrays(spec, envs)
    paths, scal = _run_mega(
        spec, settings, ctl, nodes0,
        envs.spheres, envs.capsules, envs.z_capsules, envs.cuboids,
        envs.z_cuboids, bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags,
        interpret,
    )
    return _finalize_mega(
        spec, settings, paths, scal, starts, goals,
        any_direct, first_direct,
    )
