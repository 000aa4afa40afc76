"""Path-simplification megakernel: SHORTCUT + BSPLINE in one Pallas kernel.

The lockstep XLA simplifier (planning/simplify.py) validates every candidate
pair of every problem at every driver iteration, padded to caps, and pays a
host round-trip per iteration.  After the planner megakernel, simplification
was ~75% of the MBM suite wall time.

This kernel runs the reference's simplification driver (simplify.hh:192-259)
per problem (grid = (problems,)) with the path resident in VMEM:

- SHORTCUT (simplify.hh:115-141): greedy scan with on-demand validation.
  For each vertex i, all candidate pairs (i, j) are validated in one batched
  pass and the largest valid j wins; erasure is a physical row shift.
  Validities are identical to the XLA path's precomputed pair matrix because
  erasing vertices moves nothing.
- BSPLINE (simplify.hh:14-53): subdivide + midpoint pull, candidates
  batch-validated exactly like the XLA version.

Segment validation uses fixed 128-point JOBS: a segment with n = ceil(dist *
resolution/8) backstep iterations (8n points at fractions k/(8n), matching
planning/validate.py bit-for-bit) is split into ceil(8n/128) jobs; jobs from
many segments pack 8 per (8, 128) fkcc tile, so total device work tracks the
exact interpolation point count with <= 128-point padding per segment.

Only the default op sequence ("shortcut", "bspline") is supported; settings
with REDUCE/PERTURB fall back to planning/simplify.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops.kernels.fkcc_pallas import tile_vmin, _pad_rows, _live_counts
from vamp_mvt_tpu.planning.simplify import SimplifyResult, SimplifySettings, path_cost, _pad_tail
from vamp_mvt_tpu.robots.spec import RobotSpec

JMAX = 128       # job rows per validation batch (16 tiles)
JSEG = 16        # max jobs one segment may need (dist <= 16*128/resolution)
CMAX = 160       # candidate metadata slots per batch


def _make_kernel(spec: RobotSpec, s: SimplifySettings, counts: dict, P: int):
    d = spec.dimension
    dp = max(8, 8 * ((d + 7) // 8))
    res8 = float(spec.resolution) / 8.0
    mi = float(s.bspline_midpoint_interpolation)
    min_change = float(s.bspline_min_change)
    max_iters = int(s.max_iterations)
    bspline_steps = int(s.bspline_max_steps)

    def kernel(ctl_ref, path_in, sph_ref, cap_ref, zcap_ref, cub_ref,
               zcub_ref, bm_ref, ch_ref, pt_ref, su_ref, pcm_ref, stab_ref,
               att_ref, hfm_ref, hfd_ref, envn_ref, path_out, scal_out, jscr,
               buf2, cj_smem, cst_smem, ccnt_smem, res_smem, pc_scr, pcl_scr):
        env_refs = (sph_ref, cap_ref, zcap_ref, cub_ref, zcub_ref)
        pc_refs = (bm_ref, ch_ref, pt_ref, su_ref, pcm_ref, stab_ref,
                   att_ref, hfm_ref, hfd_ref)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        subl8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        path_out[:, :] = path_in[0]
        n0 = ctl_ref[0, 0, 0]

        # ---------------- staged-job validation machinery ----------------
        def seg_njobs(a_row, b_row):
            dif = b_row - a_row
            dist = jnp.sqrt(jnp.sum(dif * dif))
            nit = jnp.maximum(jnp.ceil(dist * res8), 1.0)
            njobs = jnp.int32(jnp.ceil(nit * (8.0 / 128.0)))
            return dif, nit, njobs

        def stage_segment(jbase, a_row, dif, nit):
            """Write ceil(8*nit/128) job rows starting at jbase; row layout:
            lanes 0..d-1 = A, dp..dp+d-1 = B-A, 2dp = point offset,
            2dp+1 = total points 8n."""
            npts = 8.0 * nit
            v_sh = pltpu.roll(dif, dp, 1)
            base_row = a_row + v_sh
            njobs = jnp.int32(jnp.ceil(nit * (8.0 / 128.0)))

            def wr(q, _):
                row = jnp.where(
                    lane128 == 2 * dp, (q * 128).astype(jnp.float32),
                    jnp.where(lane128 == 2 * dp + 1, npts, base_row),
                )
                jscr[pl.ds(jbase + q, 1), :] = row
                return 0

            jax.lax.fori_loop(0, njobs, wr, 0)
            return jbase + njobs

        def run_jobs(njobs):
            """Validate job rows 0..njobs-1; res_smem[q] = 1 iff job q's 128
            points are all collision-free."""

            def tile_body(t, _):
                blk = jscr[pl.ds(t * 8, 8), :]
                off = blk[:, 2 * dp : 2 * dp + 1]
                npts = blk[:, 2 * dp + 1 : 2 * dp + 2]
                frac = jnp.minimum(
                    (off + (lane_t + 1).astype(jnp.float32)) / npts, 1.0
                )
                q_rows = [
                    blk[:, j : j + 1] + blk[:, dp + j : dp + j + 1] * frac
                    for j in range(d)
                ]
                # padding jobs (rows past njobs in the final tile) hold the
                # previous batch's rows — mask them out of the pointcloud
                # exact-scan gate (their validity is never read)
                lane_live = jnp.broadcast_to(
                    subl8 < (njobs - t * 8), (8, 128)
                )
                vmin = tile_vmin(
                    spec, counts, env_refs, q_rows, pc_refs=pc_refs,
                    pc_scratch=pc_scr, pc_list=pcl_scr, lane_mask=lane_live,
                    env_live=tuple(envn_ref[0, 0, i] for i in range(5)),
                )
                okc = jnp.sum((vmin >= 0.0).astype(jnp.float32), axis=1,
                              keepdims=True)  # (8, 1)
                for s2 in range(8):
                    cnt = jnp.int32(jnp.sum(jnp.where(subl8 == s2, okc, 0.0)))
                    res_smem[t * 8 + s2] = jnp.where(cnt == 128, 1, 0)
                return 0

            jax.lax.fori_loop(0, (njobs + 7) // 8, tile_body, 0)

        def jobs_ok(start, cnt):
            """AND of res_smem[start : start+cnt]."""

            def body(q, acc):
                return acc & (res_smem[start + q] == 1)

            return jax.lax.fori_loop(0, cnt, body, jnp.bool_(True))

        # ------------------------- straight check -------------------------
        first = path_out[0:1, :]
        last0 = path_out[pl.ds(jnp.maximum(n0 - 1, 0), 1), :]
        difS, nitS, njS = seg_njobs(first, last0)
        endS = stage_segment(0, first, difS, nitS)
        run_jobs(endS)
        straight = (n0 <= 2) | jobs_ok(0, endS)

        @pl.when(straight & (n0 > 2))
        def _():
            path_out[1:2, :] = last0

        # --------------------------- driver loop ---------------------------
        def shortcut(n):
            changed = jnp.bool_(False)

            def outer_cond(c):
                i, n, _ = c
                return i < n - 2

            def outer(c):
                i, n, changed = c
                arow = path_out[pl.ds(i, 1), :]

                # candidate batches, j descending from n-1 to i+2
                def batch_cond(bc):
                    j_hi, best_j = bc
                    return (j_hi >= i + 2) & (best_j < 0)

                def batch(bc):
                    j_hi, best_j = bc

                    # stage candidates while job slots remain
                    def stage_cond(sc):
                        j, jbase, c_n = sc
                        return (j >= i + 2) & (jbase + JSEG <= JMAX) & (
                            c_n < CMAX
                        )

                    def stage(sc):
                        j, jbase, c_n = sc
                        brow = path_out[pl.ds(j, 1), :]
                        dif, nit, njobs = seg_njobs(arow, brow)
                        newbase = stage_segment(jbase, arow, dif, nit)
                        cj_smem[c_n] = j
                        cst_smem[c_n] = jbase
                        ccnt_smem[c_n] = njobs
                        return j - 1, newbase, c_n + 1

                    j_next, jbase, c_n = jax.lax.while_loop(
                        stage_cond, stage, (j_hi, jnp.int32(0), jnp.int32(0))
                    )
                    run_jobs(jbase)

                    # first valid candidate (descending j) wins
                    def scan_cond(scn):
                        cc, bj = scn
                        return (cc < c_n) & (bj < 0)

                    def scan(scn):
                        cc, bj = scn
                        ok = jobs_ok(cst_smem[cc], ccnt_smem[cc])
                        return cc + 1, jnp.where(ok, cj_smem[cc], bj)

                    _, best_j = jax.lax.while_loop(
                        scan_cond, scan, (jnp.int32(0), best_j)
                    )
                    return j_next, best_j

                _, best_j = jax.lax.while_loop(
                    batch_cond, batch, (n - 1, jnp.int32(-1))
                )

                shift = jnp.where(best_j > i + 1, best_j - (i + 1), 0)

                @pl.when(shift > 0)
                def _():
                    def mv(k, _):
                        path_out[pl.ds(k, 1), :] = path_out[pl.ds(k + shift, 1), :]
                        return 0

                    jax.lax.fori_loop(i + 1, n - shift, mv, 0)

                return i + 1, n - shift, changed | (shift > 0)

            _, n, changed = jax.lax.while_loop(
                outer_cond, outer, (jnp.int32(0), n, changed)
            )
            return n, changed

        def bspline(n):
            changed = jnp.bool_(False)
            for _ in range(bspline_steps):
                can = (2 * n - 1 <= P) & (n >= 3)

                @pl.when(can)
                def _():
                    def sub(p, _):
                        row = path_out[pl.ds(p, 1), :]
                        buf2[pl.ds(2 * p, 1), :] = row

                        @pl.when(p < n - 1)
                        def _():
                            nrow = path_out[pl.ds(p + 1, 1), :]
                            buf2[pl.ds(2 * p + 1, 1), :] = 0.5 * (row + nrow)

                        return 0

                    jax.lax.fori_loop(0, n, sub, 0)

                    def cp(p, _):
                        path_out[pl.ds(p, 1), :] = buf2[pl.ds(p, 1), :]
                        return 0

                    jax.lax.fori_loop(0, 2 * n - 1, cp, 0)

                n = jnp.where(can, 2 * n - 1, n)

                # midpoint pull over even positions in [2, n-1), batched.
                # Candidate metadata: cj = position, cst = job start,
                # ccnt = jobs of segment 1 (seg 2's jobs follow directly);
                # the pulled midpoint is parked in buf2 row cc.
                def pull_batch_cond(bc):
                    pos, _ = bc
                    return can & (pos < n - 1)

                def pull_batch(bc):
                    pos, changed = bc

                    def stage_cond(sc):
                        p, jbase, c_n = sc
                        return (p < n - 1) & (jbase + 2 * JSEG <= JMAX) & (
                            c_n < CMAX
                        )

                    def stage(sc):
                        p, jbase, c_n = sc
                        prev = path_out[pl.ds(p - 1, 1), :]
                        cur = path_out[pl.ds(p, 1), :]
                        nxt = path_out[pl.ds(p + 1, 1), :]
                        t1 = cur + (prev - cur) * mi
                        t2 = cur + (nxt - cur) * mi
                        mid = t1 + (t2 - t1) * 0.5
                        moved = (
                            jnp.sqrt(jnp.sum((cur - mid) ** 2)) > min_change
                        )

                        def do_stage():
                            dif1, nit1, _ = seg_njobs(prev, mid)
                            b1 = stage_segment(jbase, prev, dif1, nit1)
                            dif2, nit2, _ = seg_njobs(mid, nxt)
                            b2 = stage_segment(b1, mid, dif2, nit2)
                            cj_smem[c_n] = p
                            cst_smem[c_n] = jbase
                            ccnt_smem[c_n] = b2 - jbase
                            buf2[pl.ds(c_n, 1), :] = mid
                            return b2, c_n + 1

                        nb, nc = jax.lax.cond(
                            moved, do_stage, lambda: (jbase, c_n)
                        )
                        return p + 2, nb, nc

                    pos_end, jbase, c_n = jax.lax.while_loop(
                        stage_cond, stage, (pos, jnp.int32(0), jnp.int32(0))
                    )
                    run_jobs(jbase)

                    def accept(cc, ch):
                        ok = jobs_ok(cst_smem[cc], ccnt_smem[cc])

                        @pl.when(ok)
                        def _():
                            path_out[pl.ds(cj_smem[cc], 1), :] = buf2[
                                pl.ds(cc, 1), :
                            ]

                        return ch | ok

                    changed = jax.lax.fori_loop(0, c_n, accept, changed)
                    return pos_end, changed

                _, changed = jax.lax.while_loop(
                    pull_batch_cond, pull_batch, (jnp.int32(2), changed)
                )
            return n, changed

        def driver_cond(c):
            n, iters, changed = c
            return (~straight) & changed & (iters < max_iters)

        def driver(c):
            n, iters, _ = c
            n, ch1 = shortcut(n)
            n, ch2 = bspline(n)
            return n, iters + 1, ch1 | ch2

        n_fin, iters, _ = jax.lax.while_loop(
            driver_cond, driver, (n0, jnp.int32(0), jnp.bool_(True))
        )

        scal_out[0, 0, 0] = jnp.where(straight, 2, n_fin)
        scal_out[0, 0, 1] = jnp.where(straight, 0, iters)

    return kernel, dp


def _run(spec, settings, ctl, paths, sph, cap, zcap, cub, zcub,
         bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags, interpret):
    from vamp_mvt_tpu.collision.pc_kernel import MAX_CLASSES

    has_pc, has_att, has_hf = flags
    B, P, _ = paths.shape
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
    kernel, dp = _make_kernel(spec, settings, counts, P)
    envn = _live_counts(sph, cap, zcap, cub, zcub)
    sph, cap, zcap, cub, zcub = (
        _pad_rows(a) for a in (sph, cap, zcap, cub, zcub)
    )

    def smem_spec(n, f):
        return pl.BlockSpec((1, n, f), lambda b: (b, 0, 0), memory_space=pltpu.SMEM)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            smem_spec(1, 8),
            pl.BlockSpec((1, P, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
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
        out_specs=(
            pl.BlockSpec((None, P, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((JMAX, 128), jnp.float32),   # job rows
            pltpu.VMEM((max(2 * P, CMAX), 128), jnp.float32),  # buf2 / midpoints
            pltpu.SMEM((CMAX,), jnp.int32),         # candidate j / position
            pltpu.SMEM((CMAX,), jnp.int32),         # candidate job start
            pltpu.SMEM((CMAX,), jnp.int32),         # candidate job count
            pltpu.SMEM((JMAX,), jnp.int32),         # per-job validity
            pltpu.VMEM(
                (max((spec.n_spheres + counts["attach"]) * 24, 8), 128),
                jnp.float32,
            ),  # staged sphere centers (pointcloud / heightfield loops)
            pltpu.SMEM((1, max(counts["pc_chunks"], 1)), jnp.int32),
        ],
        interpret=interpret,
    )(ctl, paths, sph, cap, zcap, cub, zcub, bm, ch, pt, su, pcm, stab,
      att, hfm, hfd, envn)


_RUN_CACHE: dict = {}


def _run_jitted(spec, settings, interpret, flags):
    key = (id(spec), settings, interpret, flags)
    if key not in _RUN_CACHE:
        _RUN_CACHE[key] = jax.jit(
            lambda ctl, paths, a, b, c, dd, e, bm, ch, pt, su, pcm, stab, att,
            hfm, hfd: _run(
                spec, settings, ctl, paths, a, b, c, dd, e,
                bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags, interpret
            )
        )
    return _RUN_CACHE[key]


def supports(settings: SimplifySettings) -> bool:
    return tuple(settings.operations) == ("shortcut", "bspline")


def simplify_batch_mega(
    spec: RobotSpec,
    envs: Environment,
    paths: jnp.ndarray,       # (B, P, d)
    lengths: jnp.ndarray,     # (B,)
    settings: SimplifySettings,
    interpret: bool | None = None,
) -> SimplifyResult:
    """Simplify a batch with the per-problem megakernel.

    Semantics match planning/simplify.py's simplify_batch for the default
    op sequence, minus its pair/job caps (this kernel validates every
    candidate pair exactly, so very long paths may simplify slightly better).
    """
    if not supports(settings):
        raise ValueError("megakernel supports operations=('shortcut','bspline')")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, P, d = paths.shape
    paths128 = jnp.concatenate(
        [paths, jnp.zeros((B, P, 128 - d), paths.dtype)], axis=2
    )
    ctl = jnp.zeros((B, 1, 8), jnp.int32)
    ctl = ctl.at[:, 0, 0].set(jnp.asarray(lengths, jnp.int32))
    from vamp_mvt_tpu.ops.kernels.fkcc_pallas import _pc_arrays

    bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags = _pc_arrays(spec, envs)
    out128, scal = _run_jitted(spec, settings, interpret, flags)(
        ctl, paths128, envs.spheres, envs.capsules, envs.z_capsules,
        envs.cuboids, envs.z_cuboids, bm, ch, pt, su, pcm, stab, att, hfm,
        hfd,
    )
    return _finalize(paths, lengths, out128, scal, d)


@functools.partial(jax.jit, static_argnums=(4,))
def _finalize(paths, lengths, out128, scal, d):
    out = out128[..., :d]
    out_len = scal[:, 0, 0]
    iters = scal[:, 0, 1]

    def one(p, L):
        pp = _pad_tail(p, L)
        return pp, path_cost(pp, L)

    out, cost = jax.vmap(one)(out, out_len)
    return SimplifyResult(
        path=out, path_length=out_len, cost=cost, iterations=iters
    )
