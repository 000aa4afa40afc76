"""Fused forward kinematics + collision checking (the reference's `fkcc`).

The reference interleaves generated FK with early-exit env/self checks over a
rake of 8 SIMD lanes (src/impl/vamp/robots/panda.hh:5226-10262).  On TPU the
rake becomes an arbitrary batch shape and every check is evaluated densely:

  fkcc(spec, env, q (..., d)) -> valid (...) bool   (True = collision-free)

Self-collision is evaluated as a masked pairwise distance matrix driven by one
small batched matmul (MXU) instead of the reference's 690 scalar pair checks;
the pair set is identical (extracted reference tables, robots/_reference_data.json).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import primitives
from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops.fk import sphere_positions
from vamp_mvt_tpu.robots.spec import RobotSpec


def _self_collision_threshold(spec: RobotSpec) -> np.ndarray:
    """(S, S) matrix: (r_i + r_j)^2 for checked pairs, -inf otherwise."""
    S = spec.n_spheres
    thr = np.full((S, S), -np.inf, dtype=np.float32)
    r = spec.sphere_radius
    for i, j in spec.self_collision_pairs:
        v = (r[i] + r[j]) ** 2
        thr[i, j] = v
        thr[j, i] = v
    return thr


_THRESH_CACHE: dict[int, np.ndarray] = {}


def self_collision(spec: RobotSpec, centers: jnp.ndarray) -> jnp.ndarray:
    """centers (..., S, 3) -> (...) bool, True = some checked pair collides.

    Collision for pair (i, j) iff |c_i - c_j|^2 - (r_i + r_j)^2 < 0, matching
    sphere_sphere_self_collision (reference collision/validity.hh:23-44).
    """
    key = id(spec)
    if key not in _THRESH_CACHE:
        _THRESH_CACHE[key] = _self_collision_threshold(spec)
    thr = jnp.asarray(_THRESH_CACHE[key])
    if thr.size == 0 or not np.isfinite(_THRESH_CACHE[key]).any():
        return jnp.zeros(centers.shape[:-2], dtype=bool)
    # Pure-elementwise pairwise distances: XLA fuses the compare+reduce into
    # the producer loop, avoiding both the bf16-precision matmul (whose ~0.4%
    # error flips borderline contacts; the reference computes in f32) and the
    # materialization of the (S, S) matrix per configuration.
    diff = centers[..., :, None, :] - centers[..., None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return jnp.any(d2 < thr, axis=(-2, -1))


def env_collision(
    env: Environment, centers: jnp.ndarray, radii: jnp.ndarray
) -> jnp.ndarray:
    """centers (..., S, 3), radii (S,) -> (...) bool, True = env collision.

    Dense equivalent of sphere_environment_in_collision
    (reference collision/validity.hh:46-158): any sphere vs any shape with a
    strictly negative signed value collides.
    """
    hits = []
    if env.spheres.shape[-2]:
        hits.append(primitives.sphere_sphere(env.spheres, centers, radii))
    if env.capsules.shape[-2]:
        hits.append(primitives.sphere_capsule(env.capsules, centers, radii))
    if env.z_capsules.shape[-2]:
        hits.append(primitives.sphere_z_capsule(env.z_capsules, centers, radii))
    if env.cuboids.shape[-2]:
        hits.append(primitives.sphere_cuboid(env.cuboids, centers, radii))
    if env.z_cuboids.shape[-2]:
        hits.append(primitives.sphere_z_cuboid(env.z_cuboids, centers, radii))
    if env.hf_meta.shape[-2]:
        hits.append(
            primitives.sphere_heightfield(env.hf_meta, env.hf_data, centers, radii)
        )
    collided = [jnp.any(h < 0.0, axis=(-2, -1)) for h in hits]
    if env.mvt is not None:
        from vamp_mvt_tpu.collision.mvt import mvt_collides

        rr = jnp.broadcast_to(radii, centers.shape[:-1])
        collided.append(jnp.any(mvt_collides(env.mvt, centers, rr), axis=-1))
    if env.capt is not None:
        from vamp_mvt_tpu.collision.capt import capt_collides

        rr = jnp.broadcast_to(radii, centers.shape[:-1])
        collided.append(jnp.any(capt_collides(env.capt, centers, rr), axis=-1))
    if not collided:
        return jnp.zeros(centers.shape[:-2], dtype=bool)
    out = collided[0]
    for c in collided[1:]:
        out = out | c
    return out


class Attachment(NamedTuple):
    """End-effector payload: spheres in an EE-relative frame
    (reference collision/attachments.hh:12-57)."""

    tf_rot: jnp.ndarray   # (3, 3) attachment frame rotation (EE-relative)
    tf_pos: jnp.ndarray   # (3,)
    spheres: jnp.ndarray  # (A, 4) x, y, z, r in the attachment frame


def make_attachment(spheres, tf_rot=None, tf_pos=None) -> Attachment:
    spheres = np.asarray(spheres, np.float32).reshape(-1, 4)
    return Attachment(
        tf_rot=jnp.asarray(np.eye(3) if tf_rot is None else tf_rot, jnp.float32),
        tf_pos=jnp.asarray(
            np.zeros(3) if tf_pos is None else tf_pos, jnp.float32
        ),
        spheres=jnp.asarray(spheres),
    )


def attachment_collision(
    spec: RobotSpec, env: Environment, q: jnp.ndarray, centers: jnp.ndarray
) -> jnp.ndarray:
    """Attachment checks (reference fkcc_attach, panda.hh:15309-15345):
    pose payload spheres from the EE frame, test vs environment and vs the
    robot's attachment-check sphere set."""
    from vamp_mvt_tpu.ops.fk import eefk

    att: Attachment = env.attachment
    R_ee, t_ee = eefk(spec, q)  # (..., 3, 3), (..., 3)
    local = jnp.einsum("ij,aj->ai", att.tf_rot, att.spheres[:, :3]) + att.tf_pos
    posed = jnp.einsum("...ij,aj->...ai", R_ee, local) + t_ee[..., None, :]
    a_r = att.spheres[:, 3]

    bad = env_collision(env, posed, a_r)

    # attachment vs robot spheres (checked subset)
    idx = jnp.asarray(spec.attachment_check_spheres)
    rob = centers[..., idx, :]                       # (..., Sc, 3)
    rob_r = jnp.asarray(spec.sphere_radius)[idx]
    d2 = jnp.sum(
        (posed[..., :, None, :] - rob[..., None, :, :]) ** 2, axis=-1
    )  # (..., A, Sc)
    rs = a_r[:, None] + rob_r[None, :]
    bad = bad | jnp.any(d2 < rs * rs, axis=(-2, -1))
    return bad


def fkcc(
    spec: RobotSpec,
    env: Environment,
    q: jnp.ndarray,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """(..., d) configurations -> (...) bool, True = collision-free.

    Equivalent of Robot::fkcc (reference robots/panda.hh:5226): FK to sphere
    centers, environment checks for all robot spheres, and self-collision for
    the robot's checked pair set.

    On TPU, dispatches to the fused Pallas kernel (ops/kernels/fkcc_pallas.py)
    when the environment supports it; the XLA-composed path below is the
    portable fallback (CPU tests, heightfields) and the numerical reference.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp

        if fp.supports(env):
            return fp.fkcc_hot(spec, env, q)
    centers = sphere_positions(spec, q)
    radii = jnp.asarray(spec.sphere_radius)
    bad = env_collision(env, centers, radii) | self_collision(spec, centers)
    if env.attachment is not None:
        bad = bad | attachment_collision(spec, env, q, centers)
    return ~bad
