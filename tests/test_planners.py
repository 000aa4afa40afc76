"""PRM, FCIT*, AORRTC planner tests."""

import numpy as np
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import aorrtc, fcit, prm, rrtc
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots import registry
from tests.test_rrtc import CAGE, PANDA_GOAL, PANDA_START

import jax


def _wall_env():
    b = envmod.EnvironmentBuilder()
    for y in np.linspace(-3, 3, 13):
        for z in np.linspace(0, 3, 7):
            if y > 2.0 and z > 2.0:
                continue
            b.add_sphere([0.0, y, z], 0.3)
    return b.build()


def _check_segments(spec, env, path):
    num = validate_mod.n_points_bound(
        spec, float(np.linalg.norm(spec.limits_high - spec.limits_low))
    )
    ok = jax.jit(
        lambda s, g: validate_mod.validate_motion_batch(spec, env, s, g, num)
    )(jnp.asarray(path[:-1]), jnp.asarray(path[1:]))
    assert bool(jnp.all(ok)), "path has invalid segments"


def test_prm_sphere_wall():
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    res = prm.solve(
        spec, env, [-2.0, 0.0, 1.0], [[2.0, 0.0, 1.0]],
        prm.PRMSettings(max_samples=1024, wave=64,
                        neighbor_params=prm.PRMStarNeighborParams(3, spec.space_measure())),
    )
    assert res.solved
    assert res.cost > 4.0  # must detour
    np.testing.assert_allclose(res.path[0], [-2, 0, 1], atol=1e-6)
    np.testing.assert_allclose(res.path[-1], [2, 0, 1], atol=1e-6)
    _check_segments(spec, env, res.path)


def test_prm_direct():
    spec = registry.sphere_spec()
    env = envmod.empty_environment()
    res = prm.solve(spec, env, [0, 0, 1.0], [[1, 1, 2.0]])
    assert res.solved and res.iterations == 0
    np.testing.assert_allclose(res.cost, np.sqrt(3), atol=1e-5)


def test_prm_build_roadmap():
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    rm = prm.build_roadmap(
        spec, env, [-2.0, 0.0, 1.0], [2.0, 0.0, 1.0],
        prm.PRMSettings(max_samples=256, wave=64,
                        neighbor_params=prm.PRMStarNeighborParams(3, spec.space_measure())),
    )
    assert rm.vertices.shape[0] >= 200
    assert len(rm.edges) > 100


def test_fcit_sphere_wall():
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    res = fcit.solve(
        spec, env, [-2.0, 0.0, 1.0], [[2.0, 0.0, 1.0]],
        fcit.FCITSettings(max_samples=256, batch_size=64),
    )
    assert res.solved
    _check_segments(spec, env, res.path)
    np.testing.assert_allclose(res.path[-1], [2, 0, 1], atol=1e-6)
    # FCIT* is asymptotically optimal: cost should be decent
    assert res.cost < 12.0


def test_aorrtc_improves_over_rrtc():
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    start = [-2.0, 0.0, 1.0]
    goal = [[2.0, 0.0, 1.0]]
    base = rrtc.RRTCSettings(range=1.0, max_iterations=512, max_samples=512,
                             max_path=64)
    r0 = jax.jit(
        lambda e, s, g, m: rrtc.plan(spec, e, s, g, m, base)
    )(env, jnp.asarray(start), jnp.asarray(goal), jnp.asarray([True]))
    assert bool(r0.solved)

    settings = aorrtc.AORRTCSettings(
        rrtc=base, max_iterations=4096, max_internal_iterations=512
    )
    res, iters = aorrtc.solve(spec, env, start, goal, settings)
    assert float(res.cost) <= float(r0.cost) + 1e-5
    # final path is valid
    L = int(res.path_length)
    _check_segments(spec, env, np.asarray(res.path)[:L])


def test_aox_respects_cost_bound():
    """AOX_RRTC connections must improve on the incumbent cost bound."""
    from vamp_mvt_tpu.planning import aox

    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    start = jnp.asarray([-2.0, 0.0, 1.0])
    goal = jnp.asarray([[2.0, 0.0, 1.0]])
    base = rrtc.RRTCSettings(range=1.0, max_iterations=1024, max_samples=1024,
                             max_path=64)
    r0 = jax.jit(
        lambda e, s, g, m: rrtc.plan(spec, e, s, g, m, base)
    )(env, start, goal, jnp.asarray([True]))
    assert bool(r0.solved)
    bound = float(r0.cost)

    r1 = jax.jit(
        lambda e, s, g, m, mc: aox.solve(spec, e, s, g, m, base, mc)
    )(env, start, goal, jnp.asarray([True]), jnp.float32(bound))
    if bool(r1.solved):
        assert float(r1.cost) < bound + 1e-4
        _check_segments(spec, env, np.asarray(r1.path)[: int(r1.path_length)])


def test_aox_unbounded_sentinel_is_sound():
    """Regression (round 5): with a huge "unbounded" max_cost sentinel, the
    augmented metric squared (bound - cost) and overflowed f32 to inf,
    collapsing the masked argmins to node 0 (the START) — AOX then joined
    its connect chain back into the start tree and reported loop paths
    (ending at the start, cost ~0) as solved.  The bound is now clamped to
    an f32-safe magnitude and the connect target is gated on having any
    eligible node.  A solved path must end at the goal and cost at least
    the straight line."""
    from vamp_mvt_tpu.planning import aox

    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    start = jnp.asarray([-2.0, 0.0, 1.0])
    goal = jnp.asarray([[2.0, 0.0, 1.0]])
    base = rrtc.RRTCSettings(range=1.0, max_iterations=1024, max_samples=1024,
                             max_path=64)
    fn = jax.jit(lambda e, s, g, m, mc: aox.solve(spec, e, s, g, m, base, mc))
    lower = float(jnp.linalg.norm(goal[0] - start))
    # the buggy code SOLVED the 1e30 case at exactly these settings with a
    # loop path ending at the start (cost ~0); soundness must hold whether
    # or not the clamped search finds a solution in budget
    for mc in (1e30, 3.0 * lower):
        r = fn(env, start, goal, jnp.asarray([True]), jnp.float32(mc))
        if not bool(r.solved):
            continue
        L = int(r.path_length)
        p = np.asarray(r.path)[:L]
        assert np.linalg.norm(p[0] - np.asarray(start)) < 1e-5
        assert np.linalg.norm(p[-1] - np.asarray(goal[0])) < 1e-5
        assert float(r.cost) >= lower - 1e-4
        _check_segments(spec, env, p)


def test_aorrtc_aox_mode():
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    start = [-2.0, 0.0, 1.0]
    goal = [[2.0, 0.0, 1.0]]
    base = rrtc.RRTCSettings(range=1.0, max_iterations=512, max_samples=512,
                             max_path=64)
    settings = aorrtc.AORRTCSettings(
        rrtc=base, max_iterations=3072, max_internal_iterations=512,
        anytime=False,
    )
    res, iters = aorrtc.solve(spec, env, start, goal, settings)
    L = int(res.path_length)
    _check_segments(spec, env, np.asarray(res.path)[:L])
    assert float(res.cost) < 12.0


def test_aorrtc_solve_batch_converges():
    """Batched AORRTC: device-wide rounds of vmapped AOX searches with
    per-problem cost carries (round-3; reference loop aorrtc.hh:431-487)."""
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    env = _wall_env()
    B = 3
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), env
    )
    starts = jnp.asarray(np.tile([-2.0, 0.0, 1.0], (B, 1)), jnp.float32)
    goals = jnp.asarray(np.tile([2.0, 0.0, 1.0], (B, 1, 1)), jnp.float32)
    goals = goals + jnp.arange(B, dtype=jnp.float32)[:, None, None] * 0.05
    masks = jnp.ones((B, 1), bool)
    base = rrtc.RRTCSettings(range=1.0, max_iterations=512, max_samples=512,
                             max_path=64)
    settings = aorrtc.AORRTCSettings(
        rrtc=base, max_iterations=2048, max_internal_iterations=512,
        anytime=False,
    )
    res, samples, hist = aorrtc.solve_batch(
        spec, envs, starts, goals, masks, settings, history=True
    )
    costs = np.asarray(res.cost)
    solved = np.isfinite(costs)
    assert solved.any(), "batched AORRTC solved nothing"
    # monotone non-increasing per-problem cost history
    h = np.asarray(hist)
    assert (np.diff(h, axis=0) <= 1e-5).all()
    # every solved final path is valid and beats/equals its initial cost
    for i in range(B):
        if not solved[i]:
            continue
        L = int(np.asarray(res.path_length)[i])
        _check_segments(spec, env, np.asarray(res.path)[i, :L])
        lb = float(np.linalg.norm(np.asarray(goals)[i, 0] - np.asarray(starts)[i]))
        assert costs[i] >= lb - 1e-5
