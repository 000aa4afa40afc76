"""FK parity vs the reference's generated programs.

Golden data (tests/golden/*.npz) is produced by tools/golden_fk.py, which
numerically interprets the reference's generated sphere_fk/eefk tables
(reference src/impl/vamp/robots/*.hh).  These tests pin our URDF-derived
batched FK (vamp_mvt_tpu/ops/fk.py) to the reference geometry.
"""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.ops import fk
from vamp_mvt_tpu.robots import registry

GOLDEN = Path(__file__).parent / "golden"
ROBOTS = ["panda", "ur5", "fetch", "baxter"]


@pytest.mark.parametrize("robot", ROBOTS)
def test_sphere_fk_matches_reference(robot):
    data = np.load(GOLDEN / f"{robot}_fk.npz")
    spec = registry.load(robot)
    configs = jnp.asarray(data["configs"])  # (K, d)
    centers = jax.jit(lambda q: fk.sphere_positions(spec, q))(configs)
    np.testing.assert_allclose(
        np.asarray(centers), data["centers"], atol=2e-5, rtol=0
    )
    np.testing.assert_allclose(spec.sphere_radius, data["radii"], atol=1e-6)


@pytest.mark.parametrize("robot", ROBOTS)
def test_eefk_matches_reference(robot):
    data = np.load(GOLDEN / f"{robot}_fk.npz")
    spec = registry.load(robot)
    configs = jnp.asarray(data["configs"])
    R, t = jax.jit(lambda q: fk.eefk(spec, q))(configs)
    np.testing.assert_allclose(np.asarray(t), data["ee_t"], atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(R), data["ee_r"], atol=2e-5, rtol=0)


def test_fk_batch_shapes():
    spec = registry.load("panda")
    q = jnp.zeros((4, 6, 7))
    out = fk.sphere_positions(spec, q)
    assert out.shape == (4, 6, 59, 3)


def test_sphere_robot_fk_is_identity():
    spec = registry.sphere_spec(radius=0.3)
    q = jnp.asarray([[1.0, 2.0, 3.0], [0.5, -0.5, 0.25]])
    out = fk.sphere_positions(spec, q)
    np.testing.assert_allclose(np.asarray(out)[:, 0, :], np.asarray(q), atol=1e-7)
