"""Compaction driver and sampler-variant regression tests."""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import rrtc
from vamp_mvt_tpu.robots import registry
from tests.test_rrtc import CAGE, PANDA_GOAL, PANDA_START


def _cage_batch(B):
    rng = np.random.default_rng(0)
    envs = []
    for _ in range(B):
        b = envmod.EnvironmentBuilder()
        for c in CAGE:
            b.add_sphere(np.asarray(c) + rng.uniform(-0.01, 0.01, 3), 0.2)
        envs.append(b.build())
    batched = envmod.stack_environments(envs)
    starts = jnp.broadcast_to(jnp.asarray(PANDA_START), (B, 7))
    goals = jnp.broadcast_to(jnp.asarray([PANDA_GOAL]), (B, 1, 7))
    masks = jnp.ones((B, 1), bool)
    return batched, starts, goals, masks


def test_compact_matches_lockstep():
    spec = registry.load("panda")
    envs, starts, goals, masks = _cage_batch(10)
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=2048, max_samples=2048, max_path=64,
        samples_per_step=8, connect_segments=4,
    )
    r1 = jax.jit(
        lambda e, s, g, m: rrtc.plan_batch(spec, e, s, g, m, settings)
    )(envs, starts, goals, masks)
    r2 = rrtc.plan_batch_compact(
        spec, envs, starts, goals, masks, settings, segment_steps=16, min_batch=2
    )
    np.testing.assert_array_equal(np.asarray(r1.solved), np.asarray(r2.solved))
    np.testing.assert_array_equal(np.asarray(r1.iterations), np.asarray(r2.iterations))
    np.testing.assert_allclose(np.asarray(r1.cost), np.asarray(r2.cost))
    np.testing.assert_allclose(np.asarray(r1.path), np.asarray(r2.path))


def test_threefry_sampler_solves():
    spec = registry.load("panda")
    envs, starts, goals, masks = _cage_batch(2)
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=4096, max_samples=4096, max_path=64,
        samples_per_step=8, connect_segments=4, sampler="threefry",
    )
    r = jax.jit(
        lambda e, s, g, m: rrtc.plan_batch(spec, e, s, g, m, settings)
    )(envs, starts, goals, masks)
    assert bool(np.asarray(r.solved).all())
