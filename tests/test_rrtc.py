"""RRT-Connect planner tests: sphere robot and the Panda sphere-cage problem.

The Panda cage mirrors the reference's installation test
(scripts/sphere_cage_example.py:16-31): 14 spheres of radius 0.2 caging the
arm, planning between the reference's canonical start/goal configurations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import rrtc
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots import registry

CAGE = [
    [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
    [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25],
    [0.35, 0.35, 0.8], [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8],
    [-0.35, -0.35, 0.8], [0, -0.55, 0.8], [0.35, -0.35, 0.8],
]
PANDA_START = [0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785]
PANDA_GOAL = [2.35, 1.0, 0.0, -0.8, 0.0, 2.5, 0.785]


def _plan_fn(spec, settings):
    return jax.jit(
        lambda env, start, goals, mask: rrtc.plan(
            spec, env, start, goals, mask, settings
        )
    )


def _check_path_valid(spec, env, result):
    """Re-validate every path segment (the reference's Path::validate)."""
    P = result.path.shape[0]
    starts, goals = result.path[:-1], result.path[1:]
    num = validate_mod.n_points_bound(
        spec, float(np.linalg.norm(spec.limits_high - spec.limits_low))
    )
    ok = jax.jit(
        lambda s, g: validate_mod.validate_motion_batch(spec, env, s, g, num)
    )(starts, goals)
    k = jnp.arange(1, P)
    ok = jnp.where(k < result.path_length, ok, True)
    assert bool(jnp.all(ok)), "solution path has invalid segments"


def test_sphere_robot_wall():
    """Point robot must go around a wall with a hole."""
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    b = envmod.EnvironmentBuilder()
    # wall at x=0 spanning y in [-3,3], z in [0,3] with a gap near (0, 2.5, 2.5)
    for y in np.linspace(-3, 3, 13):
        for z in np.linspace(0, 3, 7):
            if y > 2.0 and z > 2.0:
                continue
            b.add_sphere([0.0, y, z], 0.3)
    env = b.build()
    settings = rrtc.RRTCSettings(range=1.0, max_iterations=512, max_samples=512)
    start = jnp.asarray([-2.0, 0.0, 1.0])
    goals = jnp.asarray([[2.0, 0.0, 1.0]])
    res = _plan_fn(spec, settings)(env, start, goals, jnp.asarray([True]))
    assert bool(res.solved)
    assert int(res.path_length) >= 2
    np.testing.assert_allclose(np.asarray(res.path)[0], start, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.path)[int(res.path_length) - 1], goals[0], atol=1e-6
    )
    _check_path_valid(spec, env, res)


def test_sphere_robot_direct():
    """No obstacles: straight-line check must fire with 0 iterations."""
    spec = registry.sphere_spec()
    env = envmod.empty_environment()
    settings = rrtc.RRTCSettings(range=1.0, max_iterations=64, max_samples=64)
    start = jnp.asarray([0.0, 0.0, 1.0])
    goals = jnp.asarray([[1.0, 1.0, 2.0]])
    res = _plan_fn(spec, settings)(env, start, goals, jnp.asarray([True]))
    assert bool(res.solved)
    assert int(res.iterations) == 0
    assert int(res.path_length) == 2
    np.testing.assert_allclose(float(res.cost), np.sqrt(3.0), atol=1e-5)


def test_panda_sphere_cage():
    spec = registry.load("panda")
    b = envmod.EnvironmentBuilder()
    for c in CAGE:
        b.add_sphere(c, 0.2)
    env = b.build()
    settings = rrtc.RRTCSettings(
        range=registry.RRT_RANGES["panda"], max_iterations=2048, max_samples=2048
    )
    start = jnp.asarray(PANDA_START)
    goals = jnp.asarray([PANDA_GOAL])
    res = _plan_fn(spec, settings)(env, start, goals, jnp.asarray([True]))
    assert bool(res.solved)
    _check_path_valid(spec, env, res)
    assert float(res.cost) < 20.0


def test_panda_cage_batch():
    """Batched planning over perturbed cages solves everything."""
    spec = registry.load("panda")
    rng = np.random.default_rng(0)
    envs = []
    B = 8
    for _ in range(B):
        b = envmod.EnvironmentBuilder()
        for c in CAGE:
            b.add_sphere(np.asarray(c) + rng.uniform(-0.01, 0.01, 3), 0.2)
        envs.append(b.build())
    batched = envmod.stack_environments(envs)
    settings = rrtc.RRTCSettings(range=1.0, max_iterations=2048, max_samples=2048)
    starts = jnp.broadcast_to(jnp.asarray(PANDA_START), (B, 7))
    goals = jnp.broadcast_to(jnp.asarray(PANDA_GOAL), (B, 1, 7))
    masks = jnp.ones((B, 1), bool)
    res = jax.jit(
        lambda e, s, g, m: rrtc.plan_batch(spec, e, s, g, m, settings)
    )(batched, starts, goals, masks)
    assert bool(jnp.all(res.solved)), np.asarray(res.solved)
    assert np.asarray(res.cost).max() < 25.0


def test_sample_window_equivalence_without_dd():
    """With dynamic domain off, W>1 consumes/chooses the exact same samples
    as W=1 (no skips -> the window never advances past the first K)."""
    spec = registry.load("panda")
    b = envmod.EnvironmentBuilder()
    for c in CAGE:
        b.add_sphere(c, 0.2)
    env = b.build()
    base = dict(
        range=registry.RRT_RANGES["panda"],
        max_iterations=4096,
        max_samples=4096,
        samples_per_step=8,
        connect_segments=4,
        dynamic_domain=False,
    )
    s1 = rrtc.RRTCSettings(**base, sample_window=1)
    s4 = rrtc.RRTCSettings(**base, sample_window=4)
    start = jnp.asarray(PANDA_START)
    goals = jnp.asarray([PANDA_GOAL])
    mask = jnp.asarray([True])
    r1 = _plan_fn(spec, s1)(env, start, goals, mask)
    r4 = _plan_fn(spec, s4)(env, start, goals, mask)
    assert bool(r1.solved) and bool(r4.solved)
    assert int(r1.iterations) == int(r4.iterations)
    # identical sample choices; tiny FP differences from XLA reassociation
    np.testing.assert_allclose(
        np.asarray(r1.path), np.asarray(r4.path), atol=1e-5
    )


def test_sample_window_with_dd_solves():
    """W>1 with dynamic domain on: lanes are packed with non-skipped samples;
    result must still be a valid solution."""
    spec = registry.load("panda")
    b = envmod.EnvironmentBuilder()
    for c in CAGE:
        b.add_sphere(c, 0.2)
    env = b.build()
    settings = rrtc.RRTCSettings(
        range=registry.RRT_RANGES["panda"],
        max_iterations=8192,
        max_samples=8192,
        samples_per_step=8,
        connect_segments=4,
        sample_window=4,
    )
    start = jnp.asarray(PANDA_START)
    goals = jnp.asarray([PANDA_GOAL])
    res = _plan_fn(spec, settings)(env, start, goals, jnp.asarray([True]))
    assert bool(res.solved)
    _check_path_valid(spec, env, res)
