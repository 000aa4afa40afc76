"""Fused FK + collision-check Pallas kernel — the framework's hot kernel.

The XLA-composed fkcc (ops/fkcc.py) materializes (N, S, 3) sphere centers with
tiny minor dimensions (3 in lanes = 2% lane utilization) and a (S, S)
self-collision matrix per configuration.  This kernel is the TPU-native
re-derivation of the reference's rake-SIMD `fkcc` (robots/panda.hh:5226):
configurations live in the LANE dimension — each scalar of the FK/collision
program is an (8, 128) tile of 1024 configurations — so every op runs at full
VPU width, exactly like the reference's 8-wide AVX2 struct-of-arrays code but
128x wider, with zero intermediate materialization in HBM.

Layout: q (N, d) is transposed/reshaped host-side to (d, G, 8, 128) with
N = G*1024 (padded).  Each grid step g computes validity for its 1024 configs:
  - FK: the smat trace-time-folded program over (8, 128) tiles
  - environment: dynamic fori_loop over each shape array (params read from
    SMEM as scalars), all 59 spheres unrolled per shape
  - self-collision: the robot's exact pair table unrolled (static indices
    resolve to SSA values; radii thresholds are compile-time constants)

Heightfields, EE attachments, and kernel-resident pointclouds (env.pck) are
all handled in-kernel; the only fallback to the XLA path (ops/fkcc.py) is an
MVT/CAPT pointcloud without the kernel structure built — see supports().
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops import smat
from vamp_mvt_tpu.robots.spec import PRISMATIC, REVOLUTE, RobotSpec

BLOCK = 1024  # configs per grid step: one (8, 128) tile per scalar

# pc_phase values (perf decomposition, tools/profile_pc{,_suite}.py ONLY —
# phases other than 2 skip the exact point scan BY DESIGN and report
# colliding configurations as valid): 0 = bitmap gate only, 1 = + chunk
# bound pass (no point scans), 4 = per-sphere gate + full chunk scan
# (no bound pass), 2 = full exact phase (default; the only production value).
PC_PHASE_FULL = 2


def _fk_centers(spec: RobotSpec, q_rows):
    """FK over (8,128) tiles; returns per-sphere (cx, cy, cz) traced values."""
    trig = {}
    for f in spec.frames:
        if f.joint_type == REVOLUTE and f.q_index not in trig:
            x = q_rows[f.q_index]
            trig[f.q_index] = (jnp.cos(x), jnp.sin(x))

    poses = []
    for f in spec.frames:
        if f.parent < 0:
            R = smat.const_mat(f.origin_rot)
            t = smat.const_vec(f.origin_xyz)
        else:
            Rp, tp = poses[f.parent]
            R = smat.matmul(Rp, smat.const_mat(f.origin_rot))
            t = smat.vecadd(smat.matvec(Rp, smat.const_vec(f.origin_xyz)), tp)
        if f.joint_type == REVOLUTE:
            c, s = trig[f.q_index]
            R = smat.matmul(R, smat.axis_rotation(f.axis, c, s))
        elif f.joint_type == PRISMATIC:
            t = smat.vecadd(
                t, smat.vecscale(smat.matvec(R, smat.const_vec(f.axis)), q_rows[f.q_index])
            )
        poses.append((R, t))

    centers = []
    for k in range(spec.n_spheres):
        R, t = poses[int(spec.sphere_frame[k])]
        p = smat.vecadd(smat.matvec(R, smat.const_vec(spec.sphere_local[k])), t)
        centers.append(p)
    return centers, poses[int(spec.ee_frame)]


def _broadcast_tile(e):
    if smat.is_const(e):
        return jnp.full((8, 128), e, jnp.float32)
    return e


def tile_vmin(spec: RobotSpec, counts: dict[str, int], env_refs, q_rows,
              pc_refs=None, pc_scratch=None, pc_phase: int = PC_PHASE_FULL,
              pc_list=None, lane_mask=None, env_live=None):
    """Fused FK + collision over one (8, 128) tile of configurations.

    q_rows: list of d (8, 128) tiles (configuration dimension-major).
    env_refs: (sph, cap, zcap, cub, zcub) SMEM refs shaped (1, n, f).
    pc_refs: optional pointcloud structure refs (bitmap VMEM, chunks VMEM,
    points VMEM, meta SMEM) — see collision/pc_kernel.py; enabled when
    counts["pc_chunks"] > 0.
    Returns the (8, 128) minimum signed value over all checks — the
    configuration is collision-free iff vmin >= 0.  Shared by the fkcc
    block kernel below and the planner/simplify megakernels.
    """
    sph_ref, cap_ref, zcap_ref, cub_ref, zcub_ref = env_refs
    radii = [float(r) for r in spec.sphere_radius]
    pairs = [(int(i), int(j)) for i, j in spec.self_collision_pairs]
    pair_thr = {
        (i, j): float((spec.sphere_radius[i] + spec.sphere_radius[j]) ** 2)
        for i, j in pairs
    }
    S = spec.n_spheres

    centers, ee_pose = _fk_centers(spec, q_rows)
    cx = [_broadcast_tile(c[0]) for c in centers]
    cy = [_broadcast_tile(c[1]) for c in centers]
    cz = [_broadcast_tile(c[2]) for c in centers]

    # Track the minimum signed value over all checks (collision iff < 0);
    # f32 loop carries avoid Mosaic's vector-bool loop-carry limitation.
    vmin = jnp.full((8, 128), jnp.float32(jnp.inf))

    # --- environment: dynamic loop per shape, check-spheres unrolled ---
    # parametric over the checked sphere set so end-effector attachment
    # spheres reuse the same loops (reference fkcc_attach semantics)
    def env_checks(vmin, xs_, ys_, zs_, rads_):
        K = len(xs_)

        def sphere_body(n, m):
            sx, sy, sz, sr = (sph_ref[0, n, i] for i in range(4))
            for k in range(K):
                d2 = (xs_[k] - sx) ** 2 + (ys_[k] - sy) ** 2 + (zs_[k] - sz) ** 2
                rs = rads_[k] + sr
                m = jnp.minimum(m, d2 - rs * rs)
            return m

        def capsule_body(n, m, z_aligned):
            ref = zcap_ref if z_aligned else cap_ref
            x1, y1, z1, xv, yv, zv, r, rdv = (ref[0, n, i] for i in range(8))
            for k in range(K):
                if z_aligned:
                    dot = (zs_[k] - z1) * zv
                else:
                    dot = (xs_[k] - x1) * xv + (ys_[k] - y1) * yv + (zs_[k] - z1) * zv
                t = jnp.clip(dot * rdv, 0.0, 1.0)
                if z_aligned:
                    d2 = (xs_[k] - x1) ** 2 + (ys_[k] - y1) ** 2 + (zs_[k] - (z1 + zv * t)) ** 2
                else:
                    d2 = (
                        (xs_[k] - (x1 + xv * t)) ** 2
                        + (ys_[k] - (y1 + yv * t)) ** 2
                        + (zs_[k] - (z1 + zv * t)) ** 2
                    )
                rs = rads_[k] + r
                m = jnp.minimum(m, d2 - rs * rs)
            return m

        def cuboid_body(n, m, z_aligned):
            ref = zcub_ref if z_aligned else cub_ref
            (bx, by, bz, a1x, a1y, a1z, a2x, a2y, a2z, a3x, a3y, a3z, h1, h2, h3) = (
                ref[0, n, i] for i in range(15)
            )
            for k in range(K):
                xo, yo, zo = xs_[k] - bx, ys_[k] - by, zs_[k] - bz
                if z_aligned:
                    p1 = jnp.maximum(jnp.abs(a1x * xo + a1y * yo) - h1, 0.0)
                    p2 = jnp.maximum(jnp.abs(a2x * xo + a2y * yo) - h2, 0.0)
                    p3 = jnp.maximum(jnp.abs(zo) - h3, 0.0)
                else:
                    p1 = jnp.maximum(jnp.abs(a1x * xo + a1y * yo + a1z * zo) - h1, 0.0)
                    p2 = jnp.maximum(jnp.abs(a2x * xo + a2y * yo + a2z * zo) - h2, 0.0)
                    p3 = jnp.maximum(jnp.abs(a3x * xo + a3y * yo + a3z * zo) - h3, 0.0)
                d2 = p1 * p1 + p2 * p2 + p3 * p3
                m = jnp.minimum(m, d2 - rads_[k] * rads_[k])
            return m

        # loop bounds: the arrays are padded to the BATCH maximum per shape
        # type, but inert rows can never change a min — scan only this
        # problem's live prefix when the caller supplies per-problem counts
        # (env_live; results are bit-identical either way)
        def bound(i, static):
            return static if env_live is None else env_live[i]

        if counts["spheres"]:
            vmin = jax.lax.fori_loop(
                0, bound(0, counts["spheres"]), sphere_body, vmin
            )
        if counts["capsules"]:
            vmin = jax.lax.fori_loop(
                0, bound(1, counts["capsules"]),
                lambda n, m: capsule_body(n, m, False), vmin,
            )
        if counts["z_capsules"]:
            vmin = jax.lax.fori_loop(
                0, bound(2, counts["z_capsules"]),
                lambda n, m: capsule_body(n, m, True), vmin,
            )
        if counts["cuboids"]:
            vmin = jax.lax.fori_loop(
                0, bound(3, counts["cuboids"]),
                lambda n, m: cuboid_body(n, m, False), vmin,
            )
        if counts["z_cuboids"]:
            vmin = jax.lax.fori_loop(
                0, bound(4, counts["z_cuboids"]),
                lambda n, m: cuboid_body(n, m, True), vmin,
            )
        return vmin

    vmin = env_checks(vmin, cx, cy, cz, radii)

    # --- self collision: exact pair table, fully unrolled --------------
    for (i, j) in pairs:
        d2 = (cx[i] - cx[j]) ** 2 + (cy[i] - cy[j]) ** 2 + (cz[i] - cz[j]) ** 2
        vmin = jnp.minimum(vmin, d2 - pair_thr[(i, j)])

    # --- end-effector attachment (reference fkcc_attach,
    # panda.hh:15309-15345): pose the (pre-tf-composed) payload spheres
    # from the EE frame, test vs environment and vs the robot's
    # attachment-check sphere set; they also join the pointcloud /
    # heightfield scan sets below.
    A = counts.get("attach", 0)
    acx, acy, acz, ar = [], [], [], []
    if A:
        att_ref = pc_refs[6]
        Ree, tee = ee_pose
        for a in range(A):
            lx = att_ref[0, a, 0]
            ly = att_ref[0, a, 1]
            lz = att_ref[0, a, 2]
            lr = att_ref[0, a, 3]
            w = smat.vecadd(
                smat.matvec(Ree, [lx, ly, lz]), tee
            )
            acx.append(_broadcast_tile(w[0]))
            acy.append(_broadcast_tile(w[1]))
            acz.append(_broadcast_tile(w[2]))
            ar.append(lr)
        vmin = env_checks(vmin, acx, acy, acz, ar)
        for a in range(A):
            for kidx in [int(i) for i in spec.attachment_check_spheres]:
                d2 = (
                    (acx[a] - cx[kidx]) ** 2
                    + (acy[a] - cy[kidx]) ** 2
                    + (acz[a] - cz[kidx]) ** 2
                )
                rs = ar[a] + radii[kidx]
                vmin = jnp.minimum(vmin, d2 - rs * rs)

    # --- staged dynamic sphere set (robot + attachment) -----------------
    # Pointcloud and heightfield checks loop DYNAMICALLY over spheres
    # (unrolling 59-111x explodes Mosaic compile time): centers are
    # staged to a VMEM scratch and read back by index; per-sphere
    # radius/class comes from a small SMEM table (stab_ref).
    allx, ally, allz = cx + acx, cy + acy, cz + acz
    ST = S + A
    if counts.get("pc_chunks", 0) or counts.get("heightfields", 0):
        for k in range(ST):
            pc_scratch[k * 24 : k * 24 + 8, :] = allx[k]
            pc_scratch[k * 24 + 8 : k * 24 + 16, :] = ally[k]
            pc_scratch[k * 24 + 16 : k * 24 + 24, :] = allz[k]

    # --- pointcloud: per-class certain-free bitmap + exact chunk scan ---
    if counts.get("pc_chunks", 0):
        from vamp_mvt_tpu.collision.pc_kernel import CS, MAX_CLASSES

        bm_ref, ch_ref, pt_ref, su_ref, pcm_ref, stab_ref = pc_refs[:6]
        RROWS = counts["pc_rrows"]
        wsx = pcm_ref[0, 0, 0]
        wsy = pcm_ref[0, 0, 1]
        wsz = pcm_ref[0, 0, 2]
        inv = pcm_ref[0, 0, 3]
        Wi = jnp.int32(pcm_ref[0, 0, 4])
        pr = pcm_ref[0, 0, 5]
        nch_live = jnp.int32(pcm_ref[0, 0, 6])

        HROW0 = MAX_CLASSES * RROWS  # start of the certain-hit row half

        def sphere_body(k, vm):
            cxk = pc_scratch[pl.ds(k * 24, 8), :]
            cyk = pc_scratch[pl.ds(k * 24 + 8, 8), :]
            czk = pc_scratch[pl.ds(k * 24 + 16, 8), :]
            rk = stab_ref[0, k, 0]
            cls = jnp.int32(stab_ref[0, k, 1])
            chit_ok = stab_ref[0, k, 2] > 0.0
            gate_ok = stab_ref[0, k, 3] > 0.0

            vx = jnp.floor((cxk - wsx) * inv).astype(jnp.int32)
            vy = jnp.floor((cyk - wsy) * inv).astype(jnp.int32)
            vz = jnp.floor((czk - wsz) * inv).astype(jnp.int32)
            ing = (
                (vx >= 0) & (vx < Wi) & (vy >= 0) & (vy < Wi)
                & (vz >= 0) & (vz < Wi)
            )
            widx = jnp.where(ing, vx * Wi + vy, 0)
            lanei = widx % 128
            rowi = widx // 128
            word = jnp.zeros((8, 128), jnp.int32)
            hword = jnp.zeros((8, 128), jnp.int32)
            for rr in range(RROWS):
                rowv = jnp.broadcast_to(
                    bm_ref[pl.ds(cls * RROWS + rr, 1), :], (8, 128)
                )
                g = jnp.take_along_axis(rowv, lanei, axis=1)
                word = jnp.where(rowi == rr, g, word)
                hrowv = jnp.broadcast_to(
                    bm_ref[pl.ds(HROW0 + cls * RROWS + rr, 1), :], (8, 128)
                )
                hg = jnp.take_along_axis(hrowv, lanei, axis=1)
                hword = jnp.where(rowi == rr, hg, hword)
            zsh = jnp.where(ing, vz, 0)
            bit = (word >> zsh) & 1
            # certain-hit lanes are decided right here (any center in the
            # voxel collides); lanes whose vm is already negative are
            # decided too.  Neither needs the exact scan — the pointcloud
            # contribution is SIGN-exact, not value-exact (every consumer
            # thresholds vmin >= 0).  chit_ok gates out spheres whose
            # radius is below the class UPPER radius the hit bits were
            # built with (attachments, bucketed classes) — for those the
            # bits would falsely mark free configurations as colliding.
            chit = ing & (((hword >> zsh) & 1) == 1) & chit_ok
            vm = jnp.minimum(
                vm, jnp.where(chit, jnp.float32(-1.0), jnp.float32(jnp.inf))
            )
            alive = vm >= 0.0
            if lane_mask is not None:
                # caller-declared dead lanes (stale edge rows, padding
                # jobs): their validity is never read, so they must not
                # flag spheres into the exact scan
                alive = alive & lane_mask
            # gate_ok=False (radius above every class radius): the
            # certain-free bits are built for a smaller sphere and prove
            # nothing — always take the exact scan
            maybe = ((~ing) | (bit == 1) | (~gate_ok)) & alive

            thr = rk + pr
            thr2 = thr * thr
            any_maybe = jnp.sum(maybe.astype(jnp.float32)) > 0.0
            nch_k = jnp.where(any_maybe, nch_live, 0)
            if pc_phase == 0:
                # live data dependency (cannot change the sign of vm, so
                # decisions are unaffected) so the gate being timed is not
                # dead-code-eliminated
                return jnp.minimum(
                    vm, jnp.where(any_maybe, jnp.float32(1e30), jnp.float32(5e29))
                )

            def scan_one(c, vmc):
                # exact scan of chunk c (unrolled static lanes, points as
                # SMEM scalar operands).  Three vectorized reformulations
                # were MEASURED SLOWER on the real suite (PARITY round 5):
                # an MXU matmul over (128,8) point tiles (15.0 problems/s),
                # take_along_axis lane-broadcast gathers (27.7), and
                # sublane point columns against config rows (53.8) — vs
                # 64.6 for this scalar form with the bbox prune below.
                out = vmc
                for s2 in range(CS):
                    px = pt_ref[0, c, s2]
                    py = pt_ref[0, c, CS + s2]
                    pz = pt_ref[0, c, 2 * CS + s2]
                    d2p = (
                        (cxk - px) ** 2 + (cyk - py) ** 2 + (czk - pz) ** 2
                    )
                    out = jnp.minimum(out, d2p - thr2)
                return out

            if pc_phase in (2, 4):
                # PRODUCTION: maybe-lane-bbox chunk pruning + scalar scan
                # (measured best of four scan structures, PARITY round 5).
                # The prune is a SCALAR test of each chunk's bounding
                # sphere against the axis-aligned bbox of the MAYBE lanes
                # only (inflated by thr + chunk radius — a sound superset:
                # a chunk point within thr of a maybe lane forces the
                # chunk center inside the inflated bbox).  Unlike the
                # rejected per-lane VECTOR bound pass (r4: 15.3 s vs
                # 11.9 s), this costs no vector work per chunk and keys on
                # the (small) maybe set, not all 1024 lanes: 53.9 -> 64.6
                # problems/s on the full pointcloud suite.  Skipped chunks
                # cannot flip any sign: their points are > thr from every
                # maybe lane, and all other lanes are already decided (the
                # pointcloud contribution is sign-exact).
                mb = maybe
                x0 = jnp.min(jnp.where(mb, cxk, jnp.float32(1e30)))
                x1 = jnp.max(jnp.where(mb, cxk, jnp.float32(-1e30)))
                y0 = jnp.min(jnp.where(mb, cyk, jnp.float32(1e30)))
                y1 = jnp.max(jnp.where(mb, cyk, jnp.float32(-1e30)))
                z0 = jnp.min(jnp.where(mb, czk, jnp.float32(1e30)))
                z1 = jnp.max(jnp.where(mb, czk, jnp.float32(-1e30)))

                def bound_sel(c, cnt):
                    bx = ch_ref[0, c, 0]
                    by = ch_ref[0, c, 1]
                    bz = ch_ref[0, c, 2]
                    m = thr + ch_ref[0, c, 3]
                    hit = (
                        (bx >= x0 - m) & (bx <= x1 + m)
                        & (by >= y0 - m) & (by <= y1 + m)
                        & (bz >= z0 - m) & (bz <= z1 + m)
                    )

                    @pl.when(hit)
                    def _():
                        pc_list[0, cnt] = c

                    return cnt + hit.astype(jnp.int32)

                ncand = jax.lax.fori_loop(0, nch_k, bound_sel, jnp.int32(0))

                def scan_sel(j, vmc):
                    return scan_one(pc_list[0, j], vmc)

                return jax.lax.fori_loop(0, ncand, scan_sel, vm)

            if pc_phase == 5:
                # full chunk scan with SYNTHESIZED point values (no VMEM
                # point loads): isolates scalar-load cost vs vector
                # compute in scan_one.  Timing only — results garbage.
                def scan_nomem(c, vmc):
                    out = vmc
                    cf = c.astype(jnp.float32)
                    for s2 in range(CS):
                        px = cf * 1e-3 + float(s2)
                        py = cf * 2e-3 + float(s2) * 0.5
                        pz = cf * 3e-3 + float(s2) * 0.25
                        d2p = (
                            (cxk - px) ** 2 + (cyk - py) ** 2
                            + (czk - pz) ** 2
                        )
                        out = jnp.minimum(out, jnp.abs(d2p - thr2) + 1.0)
                    return out

                return jax.lax.fori_loop(0, nch_k, scan_nomem, vm)

            # profiling-only bound pass (phase 1): sweeps every chunk
            # bound once, compacting hit-chunk indices into an SMEM list.
            # Production does NOT use it (see phase 2 above).
            def bound_chunk(c, cnt):
                bx = ch_ref[0, c, 0]
                by = ch_ref[0, c, 1]
                bz = ch_ref[0, c, 2]
                br = ch_ref[0, c, 3]
                bd2 = (cxk - bx) ** 2 + (cyk - by) ** 2 + (czk - bz) ** 2
                rb = thr + br + 1e-4
                hit = maybe & (bd2 <= rb * rb)
                any_hit = jnp.sum(hit.astype(jnp.float32)) > 0.0

                @pl.when(any_hit)
                def _():
                    pc_list[0, cnt] = c

                return cnt + any_hit.astype(jnp.int32)

            cnt = jax.lax.fori_loop(0, nch_k, bound_chunk, jnp.int32(0))
            # phase 1: bound pass only; live dep, sign-preserving (phase 0)
            return jnp.minimum(
                vm, jnp.where(cnt > 0, jnp.float32(1e30), jnp.float32(5e29))
            )

        vmin = jax.lax.fori_loop(0, ST, sphere_body, vmin)

    # --- heightfields (reference sphere_heightfield.hh:8-30): map world
    # xy to a grid cell, chained lane-gather of the height, compare the
    # sphere bottom.  Same staged dynamic sphere loop as the pointcloud.
    if counts.get("heightfields", 0):
        NH = counts["heightfields"]
        HR = counts["hf_rows"]
        stab_ref = pc_refs[5]
        hfm_ref, hfd_ref = pc_refs[7], pc_refs[8]

        def hf_sphere(k, vm):
            cxk = pc_scratch[pl.ds(k * 24, 8), :]
            cyk = pc_scratch[pl.ds(k * 24 + 8, 8), :]
            czk = pc_scratch[pl.ds(k * 24 + 16, 8), :]
            rk = stab_ref[0, k, 0]

            def hf_one(n, vmn):
                m0 = hfm_ref[0, n, 0]
                m1 = hfm_ref[0, n, 1]
                m2 = hfm_ref[0, n, 2]
                m3 = hfm_ref[0, n, 3]
                m4 = hfm_ref[0, n, 4]
                m5 = hfm_ref[0, n, 5]
                m6 = hfm_ref[0, n, 6]
                m7 = hfm_ref[0, n, 7]
                m8 = hfm_ref[0, n, 8]
                m9 = hfm_ref[0, n, 9]
                xo = m0 - cxk
                yo = m1 - cyk
                ccx = jnp.floor(jnp.clip(m3 * xo + m8, 0.0, m6))
                ccy = jnp.floor(jnp.clip(m4 * yo + m9, 0.0, m7))
                idx = (ccy * m6 + ccx).astype(jnp.int32)
                idx = jnp.clip(idx, 0, HR * 128 - 1)
                lanei = idx % 128
                rowi = idx // 128
                zh = jnp.zeros((8, 128), jnp.float32)
                for rr in range(HR):
                    rowv = jnp.broadcast_to(
                        hfd_ref[pl.ds(n * HR + rr, 1), :], (8, 128)
                    )
                    g = jnp.take_along_axis(rowv, lanei, axis=1)
                    zh = jnp.where(rowi == rr, g, zh)
                zhs = m5 * zh + m2
                return jnp.minimum(vmn, czk - rk - zhs)

            return jax.lax.fori_loop(0, NH, hf_one, vm)

        vmin = jax.lax.fori_loop(0, ST, hf_sphere, vmin)

    return vmin


def _make_kernel(spec: RobotSpec, counts: dict[str, int],
                 pc_phase: int = PC_PHASE_FULL):
    def kernel(sph_ref, cap_ref, zcap_ref, cub_ref, zcub_ref, bm_ref, ch_ref,
               pt_ref, su_ref, pcm_ref, stab_ref, att_ref, hfm_ref, hfd_ref,
               envn_ref, q_ref, out_ref, pc_scr, pcl_scr):
        q_rows = [q_ref[0, j, 0] for j in range(spec.dimension)]  # (8,128) each
        vmin = tile_vmin(
            spec, counts, (sph_ref, cap_ref, zcap_ref, cub_ref, zcub_ref),
            q_rows,
            pc_refs=(bm_ref, ch_ref, pt_ref, su_ref, pcm_ref, stab_ref,
                     att_ref, hfm_ref, hfd_ref),
            pc_scratch=pc_scr,
            pc_phase=pc_phase,
            pc_list=pcl_scr,
            env_live=tuple(envn_ref[0, 0, i] for i in range(5)),
        )
        out_ref[0, 0] = (vmin >= 0.0).astype(jnp.int8)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 16, 17, 18))
def _run(spec, sph, cap, zcap, cub, zcub, bm, ch, pt, su, pcm, stab, att,
         hfm, hfd, qg, flags, interpret=False, pc_phase=PC_PHASE_FULL):
    """Batched launch: env leaves (B, n, f), qg (B, d, G, 8, 128).

    Grid is (B*G,); each step processes one (8,128)-tile block of 1024
    configurations for one problem, fetching that problem's (small) shape
    tables into SMEM.  Returns (B, G, 8, 128) int8 validity.
    """
    from vamp_mvt_tpu.collision.pc_kernel import MAX_CLASSES

    has_pc, has_att, has_hf = flags
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
    kernel = _make_kernel(spec, counts, pc_phase)
    B, d, G = qg.shape[0], qg.shape[1], qg.shape[2]

    def smem_spec(n, f):
        return pl.BlockSpec(
            (1, n, f), lambda g: (g // G, 0, 0), memory_space=pltpu.SMEM
        )

    def vmem_spec(n, f):
        return pl.BlockSpec(
            (None, n, f), lambda g: (g // G, 0, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=(B * G,),
        in_specs=[
            smem_spec(max(counts["spheres"], 1), 4),
            smem_spec(max(counts["capsules"], 1), 8),
            smem_spec(max(counts["z_capsules"], 1), 8),
            smem_spec(max(counts["cuboids"], 1), 15),
            smem_spec(max(counts["z_cuboids"], 1), 15),
            vmem_spec(bm.shape[-2], 128),
            smem_spec(ch.shape[-2], 8),
            smem_spec(pt.shape[-2], pt.shape[-1]),
            vmem_spec(su.shape[-2], 8),
            smem_spec(1, 8),
            smem_spec(stab.shape[-2], stab.shape[-1]),
            smem_spec(att.shape[-2], 4),
            smem_spec(hfm.shape[-2], 10),
            vmem_spec(hfd.shape[-2], 128),
            smem_spec(1, 8),
            pl.BlockSpec(
                (1, d, 1, 8, 128),
                lambda g: (g // G, 0, g % G, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, 128), lambda g: (g // G, g % G, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, 8, 128), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM(
                (max((spec.n_spheres + counts["attach"]) * 24, 8), 128),
                jnp.float32,
            ),
            pltpu.SMEM((1, max(counts["pc_chunks"], 1)), jnp.int32),
        ],
        interpret=interpret,
    )(
        _pad_rows(sph), _pad_rows(cap), _pad_rows(zcap), _pad_rows(cub),
        _pad_rows(zcub), bm, ch, pt, su, pcm, stab, att, hfm, hfd,
        _live_counts(sph, cap, zcap, cub, zcub), qg,
    )


_STAB_CACHE: dict[int, np.ndarray] = {}


def _sphere_table(spec: RobotSpec) -> np.ndarray:
    """(S, 4) float table: per-sphere radius, radius-class index, and the two
    bitmap-soundness flags (see collision/pc_kernel.py):
      col 2 `chit_ok`: 1 iff radius >= class upper radius, so the class's
        certain-HIT bits (built with the class UPPER radius) apply — a sphere
        strictly smaller than its class radius may not actually hit where the
        class-radius sphere does;
      col 3 `gate_ok`: 1 iff radius <= the largest class radius, so the
        certain-FREE bits of the assigned class are a sound gate (a larger
        radius would need a class that doesn't exist — such spheres must
        always take the exact scan)."""
    key = id(spec)
    if key not in _STAB_CACHE:
        from vamp_mvt_tpu.collision.pc_kernel import radius_classes, sphere_class

        cls_radii = radius_classes(np.asarray(spec.sphere_radius))
        tab = np.zeros((spec.n_spheres, 4), np.float32)
        for k in range(spec.n_spheres):
            r = float(spec.sphere_radius[k])
            c = sphere_class(r, cls_radii)
            tab[k, 0] = r
            tab[k, 1] = c
            tab[k, 2] = 1.0 if r >= float(cls_radii[c]) - 1e-6 else 0.0
            tab[k, 3] = 1.0 if r <= float(cls_radii[-1]) + 1e-7 else 0.0
        _STAB_CACHE[key] = tab
    return _STAB_CACHE[key]


def _pc_arrays(spec: RobotSpec, env: Environment):
    """Auxiliary kernel inputs: pointcloud structure, sphere table (robot +
    attachment rows), attachment spheres (tf pre-composed, EE frame), and
    heightfield tables.  Returns
      (bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags)
    with flags = (has_pc, has_att, has_hf) (static); absent features get
    batch-shaped dummies."""
    from vamp_mvt_tpu.collision.pc_kernel import CS, radius_classes

    lead = env.spheres.shape[:-2]
    z = lambda n, f, dt: jnp.zeros(lead + (n, f), dt)

    has_att = env.attachment is not None
    if has_att:
        a0 = env.attachment
        sp = jnp.asarray(a0.spheres)
        rot = jnp.asarray(a0.tf_rot)
        pos = jnp.asarray(a0.tf_pos)
        loc = (
            jnp.einsum("...ij,...aj->...ai", rot, sp[..., :3])
            + pos[..., None, :]
        )
        att = jnp.concatenate([loc, sp[..., 3:4]], axis=-1)
        if att.ndim == 2 and lead:
            att = jnp.broadcast_to(att, lead + att.shape)
    else:
        att = z(1, 4, jnp.float32)

    has_hf = env.hf_meta.shape[-2] > 0
    if has_hf:
        NH = env.hf_meta.shape[-2]
        C = env.hf_data.shape[-1]
        HR = (C + 127) // 128
        padc = HR * 128 - C
        hfd = jnp.concatenate(
            [env.hf_data, jnp.zeros(lead + (NH, padc), env.hf_data.dtype)],
            axis=-1,
        ).reshape(lead + (NH * HR, 128))
        hfm = env.hf_meta
    else:
        hfm = z(1, 10, jnp.float32)
        hfd = z(1, 128, jnp.float32)

    has_pc = env.pck is not None
    # sphere table: robot rows (static) + attachment rows (traced radius,
    # class from the robot's radius-class edges, soundness flags per
    # _sphere_table — an attachment radius below its class radius must not
    # inherit the class's certain-HIT bits, and one above the largest class
    # radius has no sound certain-FREE gate at all)
    stab = jnp.broadcast_to(
        jnp.asarray(_sphere_table(spec)), lead + (spec.n_spheres, 4)
    )
    if has_att:
        cr = jnp.asarray(radius_classes(np.asarray(spec.sphere_radius)))
        arad = att[..., 3:4]
        acls_i = jnp.argmax(cr >= arad - 1e-7, axis=-1, keepdims=True)
        acls = acls_i.astype(jnp.float32)
        cr_sel = jnp.take(cr, acls_i[..., 0], axis=0)[..., None]
        achit = (arad >= cr_sel - 1e-6).astype(jnp.float32)
        agate = (arad <= cr[-1] + 1e-7).astype(jnp.float32)
        stab = jnp.concatenate(
            [stab, jnp.concatenate([arad, acls, achit, agate], axis=-1)],
            axis=-2,
        )
    if has_pc:
        pk = env.pck
        bm, ch, pt, su, pcm = (
            jnp.asarray(pk.bitmap), jnp.asarray(pk.chunks),
            jnp.asarray(pk.points), jnp.asarray(pk.supers),
            jnp.asarray(pk.meta),
        )
    else:
        bm, ch, pt, su, pcm = (
            z(1, 128, jnp.int32), z(1, 8, jnp.float32),
            z(1, 3 * CS, jnp.float32), z(1, 8, jnp.float32),
            z(1, 8, jnp.float32),
        )
    return bm, ch, pt, su, pcm, stab, att, hfm, hfd, (has_pc, has_att, has_hf)


def _pad_rows(a):
    if a.shape[-2] == 0:
        return jnp.zeros(a.shape[:-2] + (1,) + a.shape[-1:], a.dtype)
    return a


def _live_counts(sph, cap, zcap, cub, zcub) -> jnp.ndarray:
    """(B, 1, 8) int32 per-problem live shape counts [sph, cap, zcap, cub,
    zcub, 0...].  Builders pad with trailing inert rows whose first
    coordinate is ~1e8, so the live rows are a prefix and a threshold count
    recovers the prefix length.  Must be computed from the PRE-_pad_rows
    arrays (the empty-type dummy row would count as live; the kernels skip
    empty types statically so those lanes are never read)."""
    def cnt(a):
        if a.shape[-2] == 0:
            return jnp.zeros(a.shape[:-2], jnp.int32)
        return jnp.sum(
            (jnp.abs(a[..., 0]) < 1e7).astype(jnp.int32), axis=-1
        )

    lc = jnp.stack(
        [cnt(sph), cnt(cap), cnt(zcap), cnt(cub), cnt(zcub)], axis=-1,
    )
    pad = jnp.zeros(lc.shape[:-1] + (3,), jnp.int32)
    return jnp.concatenate([lc, pad], axis=-1)[..., None, :]


def supports(env: Environment) -> bool:
    """Every environment feature is kernel-resident — primitives, heightfields,
    EE attachments, and pointclouds (via env.pck, collision/pc_kernel.py).
    The only fallback to the XLA path (ops/fkcc.py) is an MVT/CAPT pointcloud
    without the kernel structure built."""
    return (env.mvt is None and env.capt is None) or env.pck is not None


def fkcc_pallas_batched(
    spec: RobotSpec, envs: Environment, q: jnp.ndarray
) -> jnp.ndarray:
    """q (B, ..., d) with per-problem envs (B, ...) -> (B, ...) bool validity."""
    B = q.shape[0]
    inner = q.shape[1:-1]
    n = int(np.prod(inner)) if inner else 1
    G = max((n + BLOCK - 1) // BLOCK, 1)
    qf = q.reshape(B, n, spec.dimension)
    pad = G * BLOCK - n
    qf = jnp.concatenate(
        [qf, jnp.zeros((B, pad, spec.dimension), qf.dtype)], axis=1
    )
    # (B, N, d) -> (B, d, G, 8, 128)
    qg = jnp.swapaxes(qf, 1, 2).reshape(B, spec.dimension, G, 8, 128)
    bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags = _pc_arrays(spec, envs)
    out = _run(
        spec, envs.spheres, envs.capsules, envs.z_capsules, envs.cuboids,
        envs.z_cuboids, bm, ch, pt, su, pcm, stab, att, hfm, hfd, qg, flags,
        jax.default_backend() == "cpu",
    )
    return out.reshape(B, G * BLOCK)[:, :n].reshape((B,) + inner).astype(bool)


def fkcc_pallas_batched_lanes(
    spec: RobotSpec, envs: Environment, q_d: jnp.ndarray,
    pc_phase: int = PC_PHASE_FULL,
) -> jnp.ndarray:
    """Lanes-layout entry: q_d (B, d, N) -> (B, N) bool validity.

    Avoids the expensive (N, d) -> (d, N) relayout (minor-dim-7 transposes are
    ~4x the kernel cost at large N): callers that can build configuration
    blocks dimension-major hand them over directly; the (B, d, N) ->
    (B, d, G, 8, 128) reshape is layout-preserving.

    pc_phase != PC_PHASE_FULL is a profiling-only decomposition knob
    (tools/profile_pc.py) whose results are intentionally wrong for
    colliding-with-pointcloud configurations; no planner entry point
    exposes it.
    """
    B, d, n = q_d.shape
    G = max((n + BLOCK - 1) // BLOCK, 1)
    pad = G * BLOCK - n
    q_d = jnp.concatenate([q_d, jnp.zeros((B, d, pad), q_d.dtype)], axis=2)
    qg = q_d.reshape(B, d, G, 8, 128)
    bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags = _pc_arrays(spec, envs)
    out = _run(
        spec, envs.spheres, envs.capsules, envs.z_capsules, envs.cuboids,
        envs.z_cuboids, bm, ch, pt, su, pcm, stab, att, hfm, hfd, qg, flags,
        jax.default_backend() == "cpu", pc_phase,
    )
    return out.reshape(B, G * BLOCK)[:, :n]


def fkcc_pallas(spec: RobotSpec, env: Environment, q: jnp.ndarray) -> jnp.ndarray:
    """(..., d) configurations, single environment -> (...) bool validity."""
    batch = q.shape[:-1]
    env1 = jax.tree_util.tree_map(lambda a: a[None], env)
    out = fkcc_pallas_batched(spec, env1, q.reshape(1, -1, spec.dimension))
    return out.reshape(batch)


_VMAP_CACHE: dict[int, object] = {}
_VMAP_LANES_CACHE: dict[int, object] = {}


def fkcc_hot_lanes(spec: RobotSpec, env: Environment, q_d: jnp.ndarray) -> jnp.ndarray:
    """Single-problem lanes-layout fkcc: q_d (d, N) -> (N,) bool, with a
    custom vmap rule lowering a problem batch to one kernel launch."""
    key = id(spec)
    if key not in _VMAP_LANES_CACHE:

        @jax.custom_batching.custom_vmap
        def f(env, q_d):
            return fkcc_pallas_batched_lanes(
                spec, jax.tree_util.tree_map(lambda a: a[None], env), q_d[None]
            )[0]

        @f.def_vmap
        def _rule(axis_size, in_batched, env, q_d):
            env_b, q_b = in_batched
            env_is_batched = any(jax.tree_util.tree_leaves(env_b))
            if not q_b:
                q_d = jnp.broadcast_to(q_d[None], (axis_size,) + q_d.shape)
            if not env_is_batched:
                # shared environment: fold the batch into the lane dimension
                # and RECURSE through f, so an enclosing vmap (e.g. problems
                # around pair-chunks) still hits this rule instead of
                # serializing the raw pallas_call.
                B, d, n = q_d.shape
                folded = jnp.transpose(q_d, (1, 0, 2)).reshape(d, B * n)
                out = f(env, folded)
                return out.reshape(B, n), True
            env = jax.tree_util.tree_map(
                lambda leaf, b: leaf
                if b
                else jnp.broadcast_to(leaf[None], (axis_size,) + leaf.shape),
                env,
                env_b,
            )
            return fkcc_pallas_batched_lanes(spec, env, q_d), True

        _VMAP_LANES_CACHE[key] = f
    return _VMAP_LANES_CACHE[key](env, q_d)


def fkcc_hot(spec: RobotSpec, env: Environment, q: jnp.ndarray) -> jnp.ndarray:
    """Single-problem fkcc with a custom vmap rule that lowers a problem batch
    to ONE batched kernel launch (vmapping pallas_call directly serializes)."""
    key = id(spec)
    if key not in _VMAP_CACHE:

        @jax.custom_batching.custom_vmap
        def f(env, q):
            return fkcc_pallas(spec, env, q)

        @f.def_vmap
        def _rule(axis_size, in_batched, env, q):
            env_b, q_b = in_batched
            env = jax.tree_util.tree_map(
                lambda leaf, b: leaf
                if b
                else jnp.broadcast_to(leaf[None], (axis_size,) + leaf.shape),
                env,
                env_b,
            )
            if not q_b:
                q = jnp.broadcast_to(q[None], (axis_size,) + q.shape)
            out = fkcc_pallas_batched(spec, env, q)
            return out, True

        _VMAP_CACHE[key] = f
    return _VMAP_CACHE[key](env, q)
