"""High-level API surface tests (reference-style usage) + attachments."""

import numpy as np
import jax.numpy as jnp

import vamp_mvt_tpu as vmt
from tests.test_rrtc import CAGE, PANDA_GOAL, PANDA_START


def _cage_env():
    env = vmt.Environment()
    for c in CAGE:
        env.add_sphere(vmt.Sphere(c, 0.2))
    return env


def test_api_end_to_end_panda():
    env = _cage_env()
    assert vmt.panda.validate(PANDA_START, env)
    assert not vmt.panda.validate([0.0] * 7, env)  # in cage collision? check below

    settings = vmt.panda.default_rrtc_settings(max_iterations=2048, max_samples=2048)
    res = vmt.panda.rrtc(PANDA_START, PANDA_GOAL, env, settings)
    assert bool(res.solved)
    simple = vmt.panda.simplify(res.path, res.path_length, env)
    assert float(simple.cost) <= float(res.cost) + 1e-5

    # info functions
    assert vmt.panda.dimension() == 7
    assert vmt.panda.n_spheres() == 59
    assert len(vmt.panda.joint_names()) == 7
    rmin, rmax = vmt.panda.min_max_radii()
    assert 0 < rmin < rmax < 0.1

    # fk returns sphere table
    spheres = vmt.panda.fk(PANDA_START)
    assert spheres.shape == (59, 4)
    R, t = vmt.panda.eefk(PANDA_START)
    assert R.shape == (3, 3) and t.shape == (3,)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_api_debug_reports_collisions():
    env = vmt.Environment()
    env.add_sphere(vmt.Sphere([0.088, 0, 0.926], 0.3))  # near panda wrist at home
    dbg = vmt.panda.debug([0.0] * 7, env)
    assert len(dbg["env_colliding_spheres"]) > 0


def test_api_attachment_changes_validity():
    env = _cage_env()
    q = PANDA_START
    assert vmt.panda.validate(q, env)
    # big payload ball at the EE: collides with the cage from the start pose
    att = vmt.Attachment(spheres=[[0.0, 0.0, 0.25, 0.4]])
    env.attach(att)
    assert not vmt.panda.validate(q, env)
    # small payload is fine
    env2 = _cage_env()
    env2.attach(vmt.Attachment(spheres=[[0.0, 0.0, 0.05, 0.02]]))
    assert vmt.panda.validate(q, env2)


def test_api_attachment_vs_robot():
    """A payload sphere placed exactly on a checked robot sphere collides."""
    env = vmt.Environment()  # empty world
    # place the payload on top of robot sphere 0 (base link, in the checked
    # set) by inverting the EE pose at the start configuration
    R, t = vmt.panda.eefk(PANDA_START)
    target = vmt.panda.fk(PANDA_START)[0, :3]
    local = R.T @ (target - t)
    env.attach(vmt.Attachment(spheres=[[*local, 0.1]]))
    assert not vmt.panda.validate(PANDA_START, env)


def test_api_sampler_skip():
    env = _cage_env()
    s1 = vmt.panda.halton()
    s2 = vmt.panda.halton()
    s2.skip(100)
    settings = vmt.panda.default_rrtc_settings(max_iterations=2048, max_samples=2048)
    r1 = vmt.panda.rrtc(PANDA_START, PANDA_GOAL, env, settings, sampler=s1)
    r2 = vmt.panda.rrtc(PANDA_START, PANDA_GOAL, env, settings, sampler=s2)
    assert bool(r1.solved) and bool(r2.solved)
    # different sample streams explore differently
    assert int(r1.iterations) != int(r2.iterations) or float(r1.cost) != float(r2.cost)
