"""End-to-end pointcloud planning: Panda through a sampled-cage MVT/CAPT env."""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.ops import fkcc
from vamp_mvt_tpu.planning import rrtc
from vamp_mvt_tpu.pointcloud import pipeline, sampling
from vamp_mvt_tpu.robots import registry
from tests.test_rrtc import CAGE, PANDA_GOAL, PANDA_START


def _cage_problem():
    # the sphere cage expressed as small boxes (sampling covers boxes/cylinders)
    return {
        "problem": "cage",
        "sphere": [],
        "cylinder": [],
        "box": [
            {
                "position": c,
                "orientation_quat_xyzw": [0, 0, 0, 1],
                "half_extents": [0.14, 0.14, 0.14],
            }
            for c in CAGE
        ],
    }


def test_panda_mvt_pointcloud_plan():
    problem = _cage_problem()
    b, original, filtered, filter_ns, build_ns = pipeline.problem_to_pointcloud_env(
        "panda", problem, pc_repr="mvt", samples_per_object=2000,
        filter_type="centervox",
    )
    assert len(filtered) < len(original)
    assert build_ns > 0 and filter_ns > 0
    env = b.build()

    spec = registry.load("panda")
    start = jnp.asarray(PANDA_START)
    goal = jnp.asarray(PANDA_GOAL)
    ok = np.asarray(
        jax.jit(lambda q: fkcc.fkcc(spec, env, q, use_pallas=False))(
            jnp.stack([start, goal])
        )
    )
    assert ok.tolist() == [True, True], "start/goal must be free in the MVT env"

    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=1024, max_samples=1024, max_path=64,
        samples_per_step=4, connect_segments=4,
    )
    res = jax.jit(
        lambda e, s, g, m: rrtc.plan(spec, e, s, g, m, settings)
    )(env, start, goal[None], jnp.asarray([True]))
    assert bool(res.solved)


def test_panda_capt_vs_mvt_consistency():
    """CAPT and MVT environments agree on collision for in-range queries."""
    problem = _cage_problem()
    bm, _, filtered, _, _ = pipeline.problem_to_pointcloud_env(
        "panda", problem, pc_repr="mvt", samples_per_object=1000,
        filter_type="centervox",
    )
    bc = envmod.EnvironmentBuilder()
    spec = registry.load("panda")
    bc.add_capt_pointcloud(filtered, spec.min_radius, spec.max_radius, 0.0025)
    env_m, env_c = bm.build(), bc.build()

    rng = np.random.default_rng(11)
    q = jnp.asarray(
        rng.uniform(spec.limits_low, spec.limits_high, (64, 7)), jnp.float32
    )
    vm = np.asarray(jax.jit(lambda q: fkcc.fkcc(spec, env_m, q, use_pallas=False))(q))
    vc = np.asarray(jax.jit(lambda q: fkcc.fkcc(spec, env_c, q, use_pallas=False))(q))
    # identical point sets; CAPT has no query-radius clamp, MVT clamps windows
    # to one cell — robot radii are all <= max_radius so results must agree
    np.testing.assert_array_equal(vm, vc)
