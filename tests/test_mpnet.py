"""MPNet harness tests (untrained networks; orchestration + fallback logic)."""

import numpy as np

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import mpnet
from vamp_mvt_tpu.robots import registry


def test_mpnet_direct_connection():
    spec = registry.sphere_spec()
    env = envmod.empty_environment()
    mp = mpnet.MPNetPlanner(spec, env)
    mp.encode_environment(np.random.default_rng(0).uniform(-1, 1, (100, 3)))
    path = mp.plan([0, 0, 1.0], [1, 1, 2.0], max_iterations=2, max_planning_steps=4)
    assert path is not None and len(path) == 2  # straight line fires


def test_mpnet_rollout_produces_valid_paths():
    """Even untrained, every accepted segment must be collision-valid."""
    spec = registry.sphere_spec(lows=(-2, -2, 0), highs=(2, 2, 2), radius=0.1)
    b = envmod.EnvironmentBuilder()
    b.add_sphere([0, 0, 1.0], 0.9)
    env = b.build()
    mp = mpnet.MPNetPlanner(spec, env, seed=3)
    mp.encode_environment(np.random.default_rng(1).uniform(-1, 1, (500, 3)))
    goal = np.array([1.5, 1.5, 1.5], np.float32)
    # single-direction rollouts only accept validated segments
    path = mp._single_attempt(np.array([-1.5, -1.5, 0.5], np.float32), goal, 8)
    if path is not None:
        for a, b_ in zip(path[:-1], path[1:]):
            assert mp._valid(a, b_)


def test_plan_with_mpnet_fallback():
    """Untrained nets won't reach the goal; the RRTC fallback must."""
    import vamp_mvt_tpu as vmt

    env = vmt.Environment()
    env.add_sphere(vmt.Sphere([0, 0, 1.0], 0.4))
    pc = np.random.default_rng(2).uniform(-1, 1, (200, 3))
    start = [-2.0, 0.0, 1.0]
    goal = [2.0, 0.0, 1.0]
    # use the point robot; its module name is "sphere"
    path, method = mpnet.plan_with_mpnet("sphere", start, goal, env, pc)
    assert path is not None
    assert method in ("mpnet", "rrtc_fallback")
    np.testing.assert_allclose(path[-1], goal, atol=1e-5)
