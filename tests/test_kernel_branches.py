"""Interpret-mode coverage for every tile_vmin branch of the fused kernel.

Round 2 added kernel-resident pointclouds (collision/pc_kernel.py),
heightfields, and EE attachments to the Pallas kernel
(ops/kernels/fkcc_pallas.py) but they were exercised only by TPU-side
scripts in tools/.  These tests run the same parity checks in Pallas
interpreter mode on CPU at small sizes, so CI covers:

  - the pck bitmap + super/chunk exact scan vs brute force and the XLA MVT
    query (decisions must be identical: all three are exact),
  - the in-kernel heightfield gather vs the XLA path
    (reference sphere_heightfield.hh:8-30 semantics),
  - the in-kernel attachment checks vs the XLA path
    (reference fkcc_attach, panda.hh:15309-15345),
  - the planner megakernel (planning/rrtc_mega.py) running on pck /
    heightfield / attachment environments vs the XLA lockstep planner.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.collision.pc_kernel import radius_classes
from vamp_mvt_tpu.ops import fkcc
from vamp_mvt_tpu.planning import rrtc, rrtc_mega
from vamp_mvt_tpu.robots import registry

WMIN, WMAX = (-3.0, -3.0, 0.0), (3.0, 3.0, 6.0)
R_POINT = 0.0025


def _wall_points(n_side=9):
    """A thin wall of points at x=0 with a gap around (y, z) = (0, 2.6)."""
    ys = np.linspace(-2.0, 2.0, n_side)
    zs = np.linspace(0.5, 3.0, n_side)
    pts = []
    for y in ys:
        for z in zs:
            if abs(y) < 0.7 and z > 2.2:
                continue
            pts.append([0.0, y, z])
    return np.asarray(pts, np.float32)


def _sphere_pck_env(radius=0.25, extra=None):
    spec = registry.sphere_spec(lows=WMIN, highs=WMAX, radius=radius)
    pts = _wall_points()
    b = envmod.EnvironmentBuilder()
    if extra:
        extra(b)
    b.add_mvt_pointcloud(pts, radius, radius, WMIN, WMAX, R_POINT)
    b.add_kernel_pointcloud(
        pts, radius_classes(spec.sphere_radius), WMIN, WMAX, R_POINT,
        float(radius),
    )
    return spec, b.build(), pts


def _brute_valid(centers, radii, pts, r_point):
    """Reference-exact sphere-vs-cloud: collision iff d^2 <= (r+r_point)^2."""
    d2 = ((centers[:, None, :] - pts[None]) ** 2).sum(-1)
    thr = (radii[:, None] + r_point) ** 2
    return ~(d2 <= thr).any(axis=1)


def test_fkcc_kernel_pck_matches_brute_and_mvt():
    spec, env, pts = _sphere_pck_env()
    rng = np.random.default_rng(3)
    q = rng.uniform(
        np.asarray(WMIN) - 0.5, np.asarray(WMAX) + 0.5, (1024, 3)
    ).astype(np.float32)
    # bias a band of configs near the wall surface to stress ambiguity
    q[:300, 0] = rng.normal(0.0, 0.3, 300)

    got = np.asarray(fkcc.fkcc(spec, env, jnp.asarray(q), use_pallas=True))
    brute = _brute_valid(q, np.full(len(q), 0.25, np.float32), pts, R_POINT)
    xla = np.asarray(fkcc.fkcc(spec, env, jnp.asarray(q), use_pallas=False))
    np.testing.assert_array_equal(got, brute)
    np.testing.assert_array_equal(got, xla)


def test_fkcc_kernel_pck_panda():
    spec = registry.load("panda")
    pts = _wall_points()
    pts = pts[pts[:, 2] < 1.5] * np.float32(0.4) + np.float32([0.45, 0, 0.2])
    b = envmod.EnvironmentBuilder()
    b.add_mvt_pointcloud(
        pts, float(spec.min_radius), float(spec.max_radius), WMIN, WMAX, R_POINT
    )
    b.add_kernel_pointcloud(
        pts, radius_classes(spec.sphere_radius), WMIN, WMAX, R_POINT,
        float(spec.max_radius),
    )
    env = b.build()
    rng = np.random.default_rng(5)
    q = jnp.asarray(
        rng.uniform(spec.limits_low, spec.limits_high, (1024, 7)), jnp.float32
    )
    got = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=True))
    xla = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=False))
    assert 0 < int(got.sum()) < 1024, "test must exercise both outcomes"
    np.testing.assert_array_equal(got, xla)


def test_fkcc_kernel_heightfield_matches_xla():
    spec = registry.sphere_spec(lows=WMIN, highs=WMAX, radius=0.25)
    rng = np.random.default_rng(7)
    grid = (rng.uniform(0.2, 1.8, (16, 16))).astype(np.float32)
    meta, data = envmod.make_heightfield((0.0, 0.0, 0.0), (0.4, 0.4, 1.0), grid)
    env = envmod.EnvironmentBuilder().add_heightfield(meta, data).build()
    q = rng.uniform(
        np.asarray(WMIN), np.asarray(WMAX), (1024, 3)
    ).astype(np.float32)
    q[:, 2] = rng.uniform(0.0, 2.5, 1024)  # straddle the surface
    got = np.asarray(fkcc.fkcc(spec, env, jnp.asarray(q), use_pallas=True))
    xla = np.asarray(fkcc.fkcc(spec, env, jnp.asarray(q), use_pallas=False))
    assert 0 < int(got.sum()) < 1024
    np.testing.assert_array_equal(got, xla)


def test_fkcc_kernel_attachment_matches_xla():
    spec = registry.load("panda")
    b = envmod.EnvironmentBuilder()
    b.add_sphere([0.5, 0.0, 0.6], 0.18)
    b.add_cuboid(envmod.make_cuboid([0.0, 0.55, 0.4], [0.3, 0.2, 0.1], [0.2, 0.15, 0.1]))
    b.attach(
        fkcc.make_attachment(
            [[0.0, 0.0, 0.09, 0.06], [0.05, 0.0, 0.14, 0.04]],
            tf_pos=[0.0, 0.0, 0.02],
        )
    )
    env = b.build()
    rng = np.random.default_rng(9)
    q = jnp.asarray(
        rng.uniform(spec.limits_low, spec.limits_high, (1024, 7)), jnp.float32
    )
    got = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=True))
    xla = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=False))
    assert 0 < int(got.sum()) < 1024
    np.testing.assert_array_equal(got, xla)


def _plan_parity(spec, envs, starts, goals, masks, settings, B):
    offs = jnp.arange(B, dtype=jnp.int32) * 100
    ref = rrtc.plan_batch(spec, envs, starts, goals, masks, settings, offs)
    mega = rrtc_mega.plan_batch_mega(
        spec, envs, starts, goals, masks, settings, offs
    )
    assert np.array_equal(np.asarray(ref.solved), np.asarray(mega.solved))
    assert np.array_equal(np.asarray(ref.iterations), np.asarray(mega.iterations))
    assert np.array_equal(
        np.asarray(ref.path_length), np.asarray(mega.path_length)
    )
    np.testing.assert_allclose(
        np.asarray(ref.cost), np.asarray(mega.cost), rtol=1e-6
    )
    assert bool(np.asarray(ref.solved).any()), "parity run must solve something"


def test_mega_pck_env_plan_parity():
    spec, env, _ = _sphere_pck_env()
    B = 2
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), env
    )
    starts = jnp.asarray(np.tile([-2.0, 0.0, 2.6], (B, 1)), jnp.float32)
    goals = jnp.asarray(np.tile([2.0, 0.0, 2.6], (B, 1, 1)), jnp.float32)
    goals = goals + jnp.arange(B, dtype=jnp.float32)[:, None, None] * 0.1
    masks = jnp.ones((B, 1), bool)
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=256, max_samples=256, max_path=64,
        samples_per_step=4, connect_segments=2, sample_window=2,
    )
    _plan_parity(spec, envs, starts, goals, masks, settings, B)


def test_mega_heightfield_plan_parity():
    spec = registry.sphere_spec(lows=WMIN, highs=WMAX, radius=0.25)
    rng = np.random.default_rng(11)
    grid = rng.uniform(0.2, 2.2, (16, 16)).astype(np.float32)
    meta, data = envmod.make_heightfield((0.0, 0.0, 0.0), (0.4, 0.4, 1.0), grid)
    env = envmod.EnvironmentBuilder().add_heightfield(meta, data).build()
    B = 2
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), env
    )
    starts = jnp.asarray(np.tile([-2.5, -2.5, 3.2], (B, 1)), jnp.float32)
    goals = jnp.asarray(np.tile([2.5, 2.5, 3.2], (B, 1, 1)), jnp.float32)
    masks = jnp.ones((B, 1), bool)
    settings = rrtc.RRTCSettings(
        range=1.2, max_iterations=256, max_samples=256, max_path=64,
        samples_per_step=4, connect_segments=2, sample_window=2,
    )
    _plan_parity(spec, envs, starts, goals, masks, settings, B)


def test_mega_attachment_plan_parity():
    spec = registry.sphere_spec(lows=WMIN, highs=WMAX, radius=0.2)
    b = envmod.EnvironmentBuilder()
    for z in np.linspace(0.4, 5.6, 9):
        for y in np.linspace(-2.6, 2.6, 9):
            if abs(y) < 1.2 and abs(z - 3.0) < 1.2:
                continue
            b.add_sphere([0.0, y, z], 0.3)
    # payload sphere hanging off the point robot (clear of the robot sphere
    # itself: gap 0.4 > r_robot + r_payload): shrinks the usable hole
    b.attach(fkcc.make_attachment([[0.0, 0.4, 0.0, 0.15]]))
    env = b.build()
    B = 2
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), env
    )
    starts = jnp.asarray(np.tile([-2.0, 0.0, 3.0], (B, 1)), jnp.float32)
    goals = jnp.asarray(np.tile([2.0, 0.0, 3.0], (B, 1, 1)), jnp.float32)
    masks = jnp.ones((B, 1), bool)
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=384, max_samples=256, max_path=64,
        samples_per_step=4, connect_segments=2, sample_window=2,
    )
    _plan_parity(spec, envs, starts, goals, masks, settings, B)


def test_pck_attachment_radius_class_soundness():
    """Attachment radii need not match a robot radius class, so the
    per-class bitmap shortcuts must be gated per sphere (ADVICE r4 high):

    - a payload SMALLER than its class radius must not inherit the class's
      certain-HIT bits (they'd falsely mark near-miss configs as colliding);
    - a payload LARGER than every class radius has no sound certain-FREE
      gate at all and must always take the exact scan.
    Both cases are built geometrically: the point sits exactly on a voxel
    center so the class-radius bits are known, and the payload is placed in
    the critical band."""
    cell = 0.25  # W = floor(6 / max_radius) = 24 voxels over the 6 m box
    pc = np.asarray([[0.125, 0.125, 3.125]], np.float32)  # a voxel center
    spec = registry.sphere_spec(lows=WMIN, highs=WMAX, radius=0.25)

    def env_with(att_local, att_r, mvt_max_r):
        b = envmod.EnvironmentBuilder()
        b.add_mvt_pointcloud(pc, 0.02, mvt_max_r, WMIN, WMAX, R_POINT)
        b.add_kernel_pointcloud(
            pc, radius_classes(spec.sphere_radius), WMIN, WMAX, R_POINT, 0.25
        )
        b.attach(fkcc.make_attachment([[*att_local, att_r]]))
        return b.build()

    # Case 1: payload r=0.02 (class radius 0.25) at 0.06 from the point, in
    # the point's own voxel: the class-radius certain-hit bit is set
    # (0 <= 0.25 + r_point - half_diag) but the payload is FREE
    # (0.06 > 0.02 + r_point).
    env = env_with([0.6, 0.0, 0.0], 0.02, 0.25)
    q = jnp.asarray([[0.125 + 0.06 - 0.6, 0.125, 3.125]], jnp.float32)
    got = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=True))
    xla = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=False))
    assert got[0], "small payload near (not touching) the cloud must be free"
    np.testing.assert_array_equal(got, xla)

    # Case 2: payload r=0.4 > every class radius, at 0.38 from the point, in
    # a voxel whose class-0 certain-free bit is 0 (center 0.5 away
    # > 0.25 + r_point + half_diag): the gate would skip the exact scan, but
    # the payload COLLIDES (0.38 < 0.4 + r_point).
    env = env_with([0.9, 0.0, 0.0], 0.4, 0.45)
    q = jnp.asarray([[0.125 + 0.38 - 0.9, 0.125, 3.125]], jnp.float32)
    got = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=True))
    xla = np.asarray(fkcc.fkcc(spec, env, q, use_pallas=False))
    assert not got[0], "oversized payload touching the cloud must collide"
    np.testing.assert_array_equal(got, xla)


def test_pc_phase_default_is_exact():
    """The pc_phase decomposition knob (profiling-only) must default to the
    full exact phase: phases 0/1 skip the exact point scan by design and
    report colliding configurations as valid, so the default entry points
    must disagree with them on such configs (VERDICT r3 weak #7)."""
    from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp

    assert fp.PC_PHASE_FULL == 2
    spec, env, pts = _sphere_pck_env()
    # configs sitting exactly on wall points: certainly colliding
    q = pts[:64].copy()
    env1 = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], env)
    qd = jnp.asarray(q.T[None])
    full = np.asarray(fp.fkcc_pallas_batched_lanes(spec, env1, qd))[0]
    gate_only = np.asarray(
        fp.fkcc_pallas_batched_lanes(spec, env1, qd, pc_phase=0)
    )[0]
    assert not full.any(), "default phase must catch on-point collisions"
    assert gate_only.all(), "phase 0 must skip the exact scan (profiling)"
