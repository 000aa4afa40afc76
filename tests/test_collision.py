"""Collision primitive + environment tests against scalar numpy references.

Mirrors the formulas in reference src/impl/vamp/collision/sphere_*.hh; each
primitive is checked against an independent scalar implementation and known
geometric cases.
"""

import numpy as np
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.collision import primitives
from vamp_mvt_tpu.ops import fkcc
from vamp_mvt_tpu.robots import registry


def _env_one(kind, arr):
    b = envmod.EnvironmentBuilder()
    getattr(b, f"add_{kind}")(arr)
    return b.build()


def test_sphere_sphere():
    env = envmod.EnvironmentBuilder().add_sphere([0, 0, 1.0], 0.5).build()
    p = jnp.asarray([[0, 0, 0.0], [0, 0, 0.4], [2, 0, 1.0]])
    r = jnp.asarray([0.1, 0.2, 0.1])
    vals = primitives.sphere_sphere(env.spheres, p, r)
    # collision iff center distance < r1 + r2
    assert (np.asarray(vals) < 0).ravel().tolist() == [False, True, False]


def test_capsule_routing_and_distance():
    # vertical capsule from (0,0,0) to (0,0,1), r=0.25 -> z-aligned bucket
    arr = envmod.make_capsule_endpoints([0, 0, 0], [0, 0, 1], 0.25)
    b = envmod.EnvironmentBuilder().add_capsule(arr)
    assert len(b.z_capsules) == 1 and len(b.capsules) == 0
    env = b.build()
    p = jnp.asarray([[0.3, 0, 0.5], [0.0, 0.0, 1.4], [0.5, 0.0, 0.5]])
    r = jnp.asarray([0.1, 0.1, 0.1])
    vals = np.asarray(primitives.sphere_z_capsule(env.z_capsules, p, r)).ravel()
    assert (vals < 0).tolist() == [True, False, False]

    # tilted capsule goes in the generic bucket, same distances as scalar math
    arr2 = envmod.make_capsule_endpoints([0, 0, 0], [1, 1, 1], 0.25)
    b2 = envmod.EnvironmentBuilder().add_capsule(arr2)
    assert len(b2.capsules) == 1
    env2 = b2.build()
    vals2 = np.asarray(primitives.sphere_capsule(env2.capsules, p, r)).ravel()
    # scalar reference
    for k, (pt, rr) in enumerate(zip(np.asarray(p), np.asarray(r))):
        a, v = np.zeros(3), np.ones(3)
        t = np.clip(np.dot(pt - a, v) / 3.0, 0, 1)
        d2 = np.sum((pt - (a + v * t)) ** 2)
        expect = d2 - (rr + 0.25) ** 2
        np.testing.assert_allclose(vals2[k], expect, atol=1e-6)


def test_cuboid_signed_distance():
    # axis-aligned box at origin, half extents (1, 2, 3), rotated 0 -> z-aligned
    arr = envmod.make_cuboid([0, 0, 0], [0, 0, 0], [1, 2, 3])
    b = envmod.EnvironmentBuilder().add_cuboid(arr)
    assert len(b.z_cuboids) == 1
    env = b.build()
    p = jnp.asarray([[0, 0, 0.0], [1.5, 0, 0], [1.05, 0, 0], [0, 0, 3.2]])
    r = jnp.asarray([0.1, 0.1, 0.1, 0.1])
    vals = np.asarray(primitives.sphere_z_cuboid(env.z_cuboids, p, r)).ravel()
    assert (vals < 0).tolist() == [True, False, True, False]

    # rotated 45deg about z: sphere just outside the rotated face
    arr2 = envmod.make_cuboid([0, 0, 0], [0.3, 0.2, 0.7], [1, 2, 3])
    b2 = envmod.EnvironmentBuilder().add_cuboid(arr2)
    assert len(b2.cuboids) == 1
    env2 = b2.build()
    vals2 = np.asarray(primitives.sphere_cuboid(env2.cuboids, p, r)).ravel()
    # scalar reference using the rotation matrix
    R = envmod._euler_xyz_matrix(0.3, 0.2, 0.7)
    for k, (pt, rr) in enumerate(zip(np.asarray(p), np.asarray(r))):
        local = np.abs(R.T @ pt) - np.array([1, 2, 3.0])
        d2 = np.sum(np.maximum(local, 0) ** 2)
        np.testing.assert_allclose(vals2[k], d2 - rr * rr, atol=1e-5)


def test_heightfield():
    # 4x4 grid, heights 0..1, cell scale 1.0, z scale 1.0
    grid = np.zeros((4, 4), dtype=np.float32)
    grid[0, 0] = 1.0  # one tall cell
    meta, data = envmod.make_heightfield([0, 0, 0], [1, 1, 1], grid)
    env = envmod.EnvironmentBuilder().add_heightfield(meta, data).build()
    # cell (0,0) of the grid is at world offset (cx - px)/1 + 2 = 0 -> px = +2
    p = jnp.asarray([[2.0, 2.0, 0.5], [0.0, 0.0, 0.5], [2.0, 2.0, 1.5]])
    r = jnp.asarray([0.1, 0.1, 0.1])
    vals = np.asarray(
        primitives.sphere_heightfield(env.hf_meta, env.hf_data, p, r)
    ).ravel()
    assert (vals < 0).tolist() == [True, False, False]


def test_env_collision_padding_is_inert():
    env = envmod.EnvironmentBuilder().add_sphere([0, 0, 0], 0.5).build(
        n_spheres=8, n_capsules=4, n_cuboids=4, n_z_capsules=4, n_z_cuboids=4
    )
    p = jnp.asarray([[[5.0, 5.0, 5.0]]])  # far from the only real shape
    r = jnp.asarray([0.3])
    assert not bool(fkcc.env_collision(env, p, r)[0])
    p2 = jnp.asarray([[[0.0, 0.0, 0.6]]])
    assert bool(fkcc.env_collision(env, p2, r)[0])


def test_self_collision_panda():
    spec = registry.load("panda")
    import jax
    from vamp_mvt_tpu.ops import fk

    check = jax.jit(
        lambda q: fkcc.self_collision(spec, fk.sphere_positions(spec, q))
    )
    # Home-ish config: no self collision
    q = jnp.asarray([[0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785]])
    assert not bool(check(q)[0])

    # Fold the elbow fully: links collide
    q2 = jnp.asarray([[0.0, 1.76, 0.0, -3.07, 0.0, 3.75, 0.785]])
    assert bool(check(q2)[0])


def test_fkcc_sphere_robot():
    spec = registry.sphere_spec(radius=0.2)
    env = envmod.EnvironmentBuilder().add_sphere([0, 0, 1.0], 0.5).build()
    q = jnp.asarray([[0, 0, 0.2], [0, 0, 1.5], [0, 0, 1.0]])
    ok = np.asarray(fkcc.fkcc(spec, env, q))
    assert ok.tolist() == [True, False, False]
    q2 = jnp.asarray([[2, 2, 2.0]])
    assert bool(fkcc.fkcc(spec, env, q2)[0])
