"""Megakernel parity tests (Pallas interpret mode on CPU).

The planner megakernel (planning/rrtc_mega.py) must reproduce the XLA
lockstep planner (planning/rrtc.py) bit-for-bit: same Halton consumption,
same tree evolution, same paths.  The simplify megakernel matches the XLA
simplifier's result up to rare fp-reduction-order validity flips, so it is
checked on cost (the reference's own parity metric) and exact path equality
on the sphere robot (where reductions are trivially short).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import rrtc, rrtc_mega, simplify, simplify_mega
from vamp_mvt_tpu.robots import registry


def _sphere_problem(B=3):
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    b = envmod.EnvironmentBuilder()
    for y in np.linspace(-3, 3, 13):
        for z in np.linspace(0, 3, 7):
            if y > 2.0 and z > 2.0:
                continue
            b.add_sphere([0.0, y, z], 0.3)
    env = b.build()
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), env
    )
    starts = jnp.asarray(np.tile([-2.0, 0.0, 1.0], (B, 1)), jnp.float32)
    goals = jnp.asarray(np.tile([2.0, 0.0, 1.0], (B, 1, 1)), jnp.float32)
    goals = goals + jnp.arange(B, dtype=jnp.float32)[:, None, None] * 0.05
    masks = jnp.ones((B, 1), bool)
    return spec, envs, starts, goals, masks


@pytest.mark.parametrize("k,c,w", [(1, 1, 1), (4, 2, 2)])
def test_mega_matches_xla_planner(k, c, w):
    spec, envs, starts, goals, masks = _sphere_problem()
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=384, max_samples=512, max_path=64,
        samples_per_step=k, connect_segments=c, sample_window=w,
    )
    offs = jnp.arange(3, dtype=jnp.int32) * 100
    ref = rrtc.plan_batch(spec, envs, starts, goals, masks, settings, offs)
    mega = rrtc_mega.plan_batch_mega(
        spec, envs, starts, goals, masks, settings, offs
    )
    assert np.array_equal(np.asarray(ref.solved), np.asarray(mega.solved))
    assert np.array_equal(np.asarray(ref.iterations), np.asarray(mega.iterations))
    assert np.array_equal(np.asarray(ref.size_start), np.asarray(mega.size_start))
    assert np.array_equal(np.asarray(ref.size_goal), np.asarray(mega.size_goal))
    assert np.array_equal(
        np.asarray(ref.path_length), np.asarray(mega.path_length)
    )
    np.testing.assert_allclose(
        np.asarray(ref.cost), np.asarray(mega.cost), rtol=1e-6
    )
    for i in range(3):
        L = int(np.asarray(ref.path_length)[i])
        np.testing.assert_allclose(
            np.asarray(ref.path)[i, :L], np.asarray(mega.path)[i, :L], atol=1e-6
        )


def test_simplify_mega_matches_xla():
    spec, envs, starts, goals, masks = _sphere_problem()
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=1024, max_samples=512, max_path=64,
        samples_per_step=4, connect_segments=2, sample_window=2,
    )
    pr = rrtc.plan_batch(spec, envs, starts, goals, masks, settings)
    assert bool(np.all(np.asarray(pr.solved)))

    ss = simplify.SimplifySettings()
    ref = simplify.simplify_batch(spec, envs, pr.path, pr.path_length, ss)
    mega = simplify_mega.simplify_batch_mega(
        spec, envs, pr.path, pr.path_length, ss
    )
    np.testing.assert_allclose(
        np.asarray(ref.cost), np.asarray(mega.cost), rtol=1e-5
    )
    assert np.array_equal(
        np.asarray(ref.path_length), np.asarray(mega.path_length)
    )
    for i in range(3):
        L = int(np.asarray(ref.path_length)[i])
        np.testing.assert_allclose(
            np.asarray(ref.path)[i, :L], np.asarray(mega.path)[i, :L], atol=1e-5
        )


def test_simplify_mega_straight_line():
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    b = envmod.EnvironmentBuilder()
    b.add_sphere([0.0, 0.0, 2.9], 0.05)  # far from the test path
    env = b.build()
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (2,) + a.shape), env
    )
    # a 4-vertex path whose endpoints connect directly (open region)
    path = np.zeros((2, 16, 3), np.float32)
    path[:, 0] = [-2.0, -2.5, 1.0]
    path[:, 1] = [-1.0, -2.6, 1.2]
    path[:, 2] = [0.5, -2.7, 1.1]
    path[:, 3:] = [1.5, -2.5, 1.0]
    lengths = jnp.asarray([4, 4], jnp.int32)
    ss = simplify.SimplifySettings()
    res = simplify_mega.simplify_batch_mega(
        spec, envs, jnp.asarray(path), lengths, ss
    )
    assert np.array_equal(np.asarray(res.path_length), [2, 2])
    assert np.array_equal(np.asarray(res.iterations), [0, 0])
    np.testing.assert_allclose(np.asarray(res.path)[:, 0], path[:, 0])
    np.testing.assert_allclose(np.asarray(res.path)[:, 1], path[:, 3])


def test_mega_interleave_solves_with_valid_paths():
    """interleave=True (megakernel-only cadence: grow every step, active
    connect chains ride along) must still produce collision-free paths and
    solve the same problems; sample consumption may differ from the
    alternating cadence."""
    import dataclasses

    from vamp_mvt_tpu.planning import validate as validate_mod

    spec, envs, starts, goals, masks = _sphere_problem()
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=2048, max_samples=512, max_path=64,
        samples_per_step=4, connect_segments=2, sample_window=2,
        interleave=True,
    )
    res = rrtc_mega.plan_batch_mega(spec, envs, starts, goals, masks, settings)
    solved = np.asarray(res.solved)
    assert solved.all()
    env1 = jax.tree_util.tree_map(lambda a: a[0], envs)
    for i in np.flatnonzero(solved):
        L = int(np.asarray(res.path_length)[i])
        assert L >= 2
        p = np.asarray(res.path[i])[:L]
        for a, b in zip(p[:-1], p[1:]):
            v = validate_mod.validate_motion_batch(
                spec, env1, jnp.asarray(a[None]), jnp.asarray(b[None]), 64
            )
            assert bool(np.asarray(v)[0])
