"""Simplification tests: shortcut/bspline on planner output and known paths."""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import rrtc, simplify
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots import registry
from tests.test_rrtc import CAGE, PANDA_GOAL, PANDA_START


def _pad(path, P):
    path = np.asarray(path, np.float32)
    out = np.tile(path[-1], (P, 1))
    out[: len(path)] = path
    return jnp.asarray(out), jnp.int32(len(path))


def test_shortcut_straightens_detour():
    """A zig-zag in free space must collapse to the straight line."""
    spec = registry.sphere_spec()
    env = envmod.empty_environment()
    path, length = _pad(
        [[0, 0, 1], [0.5, 1, 1], [1, 0.2, 1.5], [1.5, -1, 1], [2, 0, 1]], 32
    )
    res = jax.jit(
        lambda p, l: simplify.simplify(spec, env, p, l, simplify.SimplifySettings())
    )(path, length)
    assert int(res.path_length) == 2
    np.testing.assert_allclose(float(res.cost), 2.0, atol=1e-5)


def test_shortcut_respects_obstacle():
    """Shortcut must keep a detour around a blocking sphere."""
    spec = registry.sphere_spec(radius=0.1)
    env = envmod.EnvironmentBuilder().add_sphere([1.0, 0.0, 1.0], 0.5).build()
    path, length = _pad(
        [[0, 0, 1], [0.7, 1.2, 1], [1.3, 1.2, 1], [2, 0, 1]], 32
    )
    settings = simplify.SimplifySettings(operations=("shortcut",))
    res = jax.jit(
        lambda p, l: simplify.simplify(spec, env, p, l, settings)
    )(path, length)
    # straight line is blocked, so the path keeps at least one via point
    assert int(res.path_length) >= 3
    # every output segment must still be valid
    num = validate_mod.n_points_bound(spec, 30.0)
    ok = jax.jit(
        lambda s, g: validate_mod.validate_motion_batch(spec, env, s, g, num)
    )(res.path[:-1], res.path[1:])
    k = jnp.arange(1, res.path.shape[0])
    assert bool(jnp.all(jnp.where(k < res.path_length, ok, True)))


def test_simplify_panda_cage_reduces_cost():
    spec = registry.load("panda")
    b = envmod.EnvironmentBuilder()
    for c in CAGE:
        b.add_sphere(c, 0.2)
    env = b.build()
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=2048, max_samples=2048, max_path=96
    )
    res = jax.jit(
        lambda e, s, g, m: rrtc.plan(spec, e, s, g, m, settings)
    )(env, jnp.asarray(PANDA_START), jnp.asarray([PANDA_GOAL]), jnp.asarray([True]))
    assert bool(res.solved)

    sres = jax.jit(
        lambda p, l: simplify.simplify(
            spec, env, p, l, simplify.SimplifySettings()
        )
    )(res.path, res.path_length)
    assert float(sres.cost) <= float(res.cost) + 1e-5
    assert float(sres.cost) < 0.8 * float(res.cost)  # meaningful reduction
    # endpoints preserved
    np.testing.assert_allclose(
        np.asarray(sres.path[0]), np.asarray(res.path[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sres.path[int(sres.path_length) - 1]),
        np.asarray(res.path[int(res.path_length) - 1]),
        atol=1e-6,
    )
    # simplified path still valid
    num = validate_mod.n_points_bound(
        spec, float(np.linalg.norm(spec.limits_high - spec.limits_low))
    )
    ok = jax.jit(
        lambda s, g: validate_mod.validate_motion_batch(spec, env, s, g, num)
    )(sres.path[:-1], sres.path[1:])
    k = jnp.arange(1, sres.path.shape[0])
    assert bool(jnp.all(jnp.where(k < sres.path_length, ok, True)))
