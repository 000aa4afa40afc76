"""Pointcloud structures and filters: MVT/CAPT vs brute force, filter props."""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import capt as capt_mod
from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.collision import mvt as mvt_mod
from vamp_mvt_tpu.pointcloud import filters, sampling

R_POINT = 0.0025


def _brute(points, p, r):
    """Ground truth: any point within r + R_POINT (inclusive)."""
    d2 = np.sum((points[None, :, :] - p[:, None, :]) ** 2, axis=-1)
    rq = (r + R_POINT) ** 2
    return (d2 <= rq[:, None]).any(axis=1)


def _random_cloud(n, rng, lo=-1.0, hi=1.0):
    return rng.uniform(lo, hi, (n, 3)).astype(np.float32)


def test_mvt_matches_brute_force():
    rng = np.random.default_rng(3)
    points = _random_cloud(2000, rng)
    mvt = mvt_mod.build_mvt(points, 0.01, 0.08, [-1, -1, -1], [1, 1, 1], R_POINT)
    p = rng.uniform(-1.2, 1.2, (500, 3)).astype(np.float32)
    r = rng.uniform(0.005, 0.075, 500).astype(np.float32)
    got = np.asarray(jax.jit(lambda p, r: mvt_mod.mvt_collides(mvt, p, r))(p, r))
    want = _brute(points, p, r)
    np.testing.assert_array_equal(got, want)


def test_mvt_query_radius_clamp():
    """Queries larger than max_radius are clamped to a 1-cell window, exactly
    like the reference (mvt.hh:221-232) — may miss far points by design."""
    rng = np.random.default_rng(4)
    points = _random_cloud(500, rng)
    mvt = mvt_mod.build_mvt(points, 0.01, 0.1, [-1, -1, -1], [1, 1, 1], R_POINT)
    p = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    r = np.full(100, 0.05, np.float32)
    got = np.asarray(mvt_mod.mvt_collides(mvt, p, r))
    want = _brute(points, p, r)
    np.testing.assert_array_equal(got, want)


def test_capt_matches_brute_force():
    rng = np.random.default_rng(5)
    points = _random_cloud(1000, rng)
    capt = capt_mod.build_capt(points, 0.01, 0.08, R_POINT)
    p = rng.uniform(-1.2, 1.2, (500, 3)).astype(np.float32)
    r = rng.uniform(0.01, 0.08, 500).astype(np.float32)
    got = np.asarray(jax.jit(lambda p, r: capt_mod.capt_collides(capt, p, r))(p, r))
    want = _brute(points, p, r)
    np.testing.assert_array_equal(got, want)


def test_capt_nonpow2_and_small():
    rng = np.random.default_rng(6)
    for n in [1, 2, 3, 7, 100]:
        points = _random_cloud(n, rng)
        capt = capt_mod.build_capt(points, 0.01, 0.1, R_POINT)
        p = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        r = np.full(64, 0.09, np.float32)
        got = np.asarray(capt_mod.capt_collides(capt, p, r))
        want = _brute(points, p, r)
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_scdf_filter_properties():
    rng = np.random.default_rng(7)
    pc = _random_cloud(3000, rng)
    out = filters.filter_scdf(pc, 0.05, 1.0, [0, 0, 0], [-1, -1, -1], [1, 1, 1])
    assert 0 < len(out) < len(pc)
    # every kept point is within range
    assert (np.sum(out**2, axis=1) < 1.0).all()
    # the kept set is a subset of the input
    d = np.abs(out[:, None, :] - pc[None, :, :]).sum(-1).min(1)
    assert d.max() == 0.0


def test_centervox_filter_properties():
    rng = np.random.default_rng(8)
    pc = _random_cloud(3000, rng)
    out = filters.filter_centervox(pc, 0.2, 1.0, [0, 0, 0], [-1, -1, -1], [1, 1, 1])
    assert 0 < len(out) < len(pc)
    # one point per voxel: all voxel keys unique
    ww = 2.0
    gw = min(255, int(np.ceil(ww / 0.2)))
    v = np.clip(((out - (-1.0)) * (gw / ww)).astype(int), 0, 254)
    keys = (v[:, 0] << 16) | (v[:, 1] << 8) | v[:, 2]
    assert len(np.unique(keys)) == len(keys)


def test_mvt_in_environment_sphere_robot():
    """Sphere robot planning against an MVT wall."""
    from vamp_mvt_tpu.ops import fkcc
    from vamp_mvt_tpu.robots import registry

    rng = np.random.default_rng(9)
    # wall of points at x=0
    yz = rng.uniform(-2, 2, (4000, 2)).astype(np.float32)
    points = np.concatenate([np.zeros((4000, 1), np.float32), yz], axis=1)
    b = envmod.EnvironmentBuilder()
    b.add_mvt_pointcloud(points, 0.05, 0.3, [-3, -3, -3], [3, 3, 3], R_POINT)
    env = b.build()
    spec = registry.sphere_spec(lows=(-3, -3, -3), highs=(3, 3, 3), radius=0.2)
    q = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.15, 0.0, 0.0]])
    ok = np.asarray(jax.jit(lambda q: fkcc.fkcc(spec, env, q, use_pallas=False))(q))
    assert ok.tolist() == [False, True, False]


def test_problem_pointcloud_sampling_deterministic():
    problem = {
        "cylinder": [
            {
                "position": [0.5, 0, 0.5],
                "orientation_quat_xyzw": [0, 0, 0, 1],
                "radius": 0.1,
                "length": 0.4,
            }
        ],
        "box": [
            {
                "position": [0, 0.5, 0.2],
                "orientation_quat_xyzw": [0, 0, 0, 1],
                "half_extents": [0.1, 0.2, 0.2],
            }
        ],
    }
    pc1 = sampling.problem_to_pointcloud(problem, 500)
    pc2 = sampling.problem_to_pointcloud(problem, 500)
    assert pc1.shape == (1000, 3)
    np.testing.assert_array_equal(pc1, pc2)
    # cylinder points near its surface
    cyl = pc1[:500] - np.array([0.5, 0, 0.5])
    rad = np.sqrt(cyl[:, 0] ** 2 + cyl[:, 1] ** 2)
    assert (rad <= 0.1 + 1e-5).all() and (np.abs(cyl[:, 2]) <= 0.2 + 1e-5).all()
