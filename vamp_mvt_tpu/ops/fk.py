"""Batched forward kinematics over a RobotSpec kinematic tree.

Replaces the reference's per-robot generated FK programs
(src/impl/vamp/robots/panda.hh:116-466 `sphere_fk`) with a traced tensor
program: configurations of any batch shape (..., d) map to sphere centers
(..., S, 3).  The chain is unrolled at trace time over the ~10-20 frames; all
emitted operations are elementwise over the batch, which XLA fuses into a
single VPU program with the batch in the lane dimension — the TPU analogue of
the reference's struct-of-arrays `rake` vectorization.
"""

from __future__ import annotations

import jax.numpy as jnp

from vamp_mvt_tpu.ops import smat
from vamp_mvt_tpu.robots.spec import FIXED, PRISMATIC, REVOLUTE, RobotSpec


def link_poses(spec: RobotSpec, q: jnp.ndarray):
    """Compute per-frame poses.

    Args:
      spec: static robot data.
      q: (..., d) configurations.

    Returns:
      list over frames of (R, t) where R is a 3x3 nested list and t a length-3
      list of entries that are either Python floats or (...,)-shaped arrays.
    """
    qc = [q[..., i] for i in range(spec.dimension)]
    trig = [(jnp.cos(x), jnp.sin(x)) for x in qc]

    poses = []
    for f in spec.frames:
        if f.parent < 0:
            R = smat.const_mat(f.origin_rot)
            t = smat.const_vec(f.origin_xyz)
        else:
            Rp, tp = poses[f.parent]
            R = smat.matmul(Rp, smat.const_mat(f.origin_rot))
            t = smat.vecadd(smat.matvec(Rp, smat.const_vec(f.origin_xyz)), tp)
        if f.joint_type == REVOLUTE:
            c, s = trig[f.q_index]
            R = smat.matmul(R, smat.axis_rotation(f.axis, c, s))
        elif f.joint_type == PRISMATIC:
            t = smat.vecadd(t, smat.vecscale(smat.matvec(R, smat.const_vec(f.axis)), qc[f.q_index]))
        poses.append((R, t))
    return poses


def _broadcast(e, shape):
    if smat.is_const(e):
        return jnp.full(shape, e, dtype=jnp.float32)
    return jnp.broadcast_to(e, shape).astype(jnp.float32)


def sphere_positions(spec: RobotSpec, q: jnp.ndarray) -> jnp.ndarray:
    """Sphere centers for every collision sphere: (..., d) -> (..., S, 3).

    Sphere order matches the reference's generated index order (verified by
    tests/test_fk_golden.py against an interpretation of the reference tables).
    """
    poses = link_poses(spec, q)
    batch = q.shape[:-1]
    cols = []
    for k in range(spec.n_spheres):
        R, t = poses[int(spec.sphere_frame[k])]
        local = smat.const_vec(spec.sphere_local[k])
        p = smat.vecadd(smat.matvec(R, local), t)
        cols.append([_broadcast(pi, batch) for pi in p])
    # (..., S, 3)
    return jnp.stack([jnp.stack(c, axis=-1) for c in cols], axis=-2)


def eefk(spec: RobotSpec, q: jnp.ndarray):
    """End-effector pose: (..., d) -> (R (..., 3, 3), t (..., 3)).

    Mirrors the reference's `eefk` (src/impl/vamp/robots/panda.hh:15447).
    """
    poses = link_poses(spec, q)
    R, t = poses[spec.ee_frame]
    batch = q.shape[:-1]
    Rj = jnp.stack(
        [jnp.stack([_broadcast(R[i][j], batch) for j in range(3)], axis=-1) for i in range(3)],
        axis=-2,
    )
    tj = jnp.stack([_broadcast(ti, batch) for ti in t], axis=-1)
    return Rj, tj
