"""Build baked robot specs (vamp_mvt_tpu/robots/_specs.json) from URDF data.

Parses the spherized URDFs shipped with the reference
(/root/reference/resources/<robot>/<robot>_spherized.urdf) together with the
behavioral tables extracted by tools/extract_reference_data.py (self-collision
pairs, joint order, resolution, end effector), verifies the sphere ordering
against the reference's radii tables, and writes a standalone JSON spec.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from vamp_mvt_tpu.robots import registry
from vamp_mvt_tpu.robots.spec import (
    FIXED,
    PRISMATIC,
    REVOLUTE,
    load_reference_data,
    parse_urdf,
)

RESOURCES = Path("/root/reference/resources")


def numpy_fk(spec, q: np.ndarray) -> np.ndarray:
    """Scalar numpy FK for spec-building/verification. q: (d,) -> (S, 3)."""
    R = [None] * len(spec.frames)
    t = [None] * len(spec.frames)
    for i, f in enumerate(spec.frames):
        if f.parent < 0:
            Ri, ti = np.eye(3), np.zeros(3)
        else:
            Rp, tp = R[f.parent], t[f.parent]
            Ri = Rp @ f.origin_rot
            ti = Rp @ f.origin_xyz + tp
        if f.joint_type == REVOLUTE:
            a, th = f.axis, q[f.q_index]
            K = np.array(
                [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]], dtype=float
            )
            Rj = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
            Ri = Ri @ Rj
        elif f.joint_type == PRISMATIC:
            ti = ti + Ri @ (f.axis * q[f.q_index])
        R[i], t[i] = Ri, ti
    return np.stack(
        [R[fi] @ p + t[fi] for fi, p in zip(spec.sphere_frame, spec.sphere_local)]
    )


def match_reference_order(robot: str, spec, ref: dict) -> np.ndarray:
    """Permutation perm with perm[ref_idx] = urdf_sphere_idx, matched by
    golden FK positions at random configs (tools/golden_fk.py interpreter)."""
    from tools.golden_fk import golden_for_robot

    rng = np.random.default_rng(7)
    configs = rng.uniform(spec.limits_low, spec.limits_high, size=(3, spec.dimension))
    centers, radii, _, _ = golden_for_robot(
        robot, spec.n_spheres, spec.dimension, configs.astype(np.float64)
    )  # (K, S, 3) in reference order
    mine = np.stack([numpy_fk(spec, q) for q in configs])  # (K, S, 3)
    # distance matrix between reference spheres and mine, summed over configs
    d = np.linalg.norm(centers[:, :, None, :] - mine[:, None, :, :], axis=-1).sum(0)
    d += 1e3 * (
        ~np.isclose(radii[:, None], spec.sphere_radius[None, :], atol=1e-6)
    )
    perm = np.full(spec.n_spheres, -1, dtype=np.int64)
    used = np.zeros(spec.n_spheres, dtype=bool)
    for ref_i in range(spec.n_spheres):
        order = np.argsort(d[ref_i])
        for j in order:
            if not used[j]:
                break
        if d[ref_i, j] > 1e-3 * len(configs):
            raise RuntimeError(
                f"{robot}: no positional match for reference sphere {ref_i} "
                f"(best residual {d[ref_i, j]:.2e})"
            )
        perm[ref_i] = j
        used[j] = True
    return perm


def build(robot: str, ref: dict) -> dict:
    urdf = RESOURCES / robot / f"{robot}_spherized.urdf"
    spec = parse_urdf(
        urdf,
        name=robot,
        resolution=ref["resolution"],
        end_effector=ref["end_effector"],
        self_collision_pairs=np.array(ref["self_collision_pairs"], dtype=np.int32),
        joint_order=ref["joint_names"],
        attachment_check_spheres=np.array(ref["attachment_check_spheres"], dtype=np.int32),
    )
    ref_radii = np.array(ref["radii"], dtype=np.float32)
    if spec.n_spheres != len(ref_radii):
        raise RuntimeError(
            f"{robot}: sphere count mismatch urdf={spec.n_spheres} ref={len(ref_radii)}"
        )
    # Reorder spheres into the reference's index order (self-collision pair
    # indices refer to that order), matching by golden FK positions.
    perm = match_reference_order(robot, spec, ref)
    spec = dataclasses.replace(
        spec,
        sphere_frame=spec.sphere_frame[perm],
        sphere_local=spec.sphere_local[perm],
        sphere_radius=spec.sphere_radius[perm],
    )
    if not np.allclose(spec.sphere_radius, ref_radii, atol=1e-6):
        raise RuntimeError(f"{robot}: radii mismatch after permutation")
    print(
        f"{robot}: d={spec.dimension} S={spec.n_spheres} "
        f"pairs={len(spec.self_collision_pairs)} frames={len(spec.frames)} OK"
    )
    return registry.spec_to_dict(spec)


def main():
    ref_data = load_reference_data()
    out = {}
    for robot in ["panda", "ur5", "fetch", "baxter"]:
        out[robot] = build(robot, ref_data[robot])
    path = Path(__file__).parent.parent / "vamp_mvt_tpu" / "robots" / "_specs.json"
    path.write_text(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
