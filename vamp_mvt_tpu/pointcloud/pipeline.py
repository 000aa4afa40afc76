"""Problem -> pointcloud -> filtered cloud -> MVT/CAPT environment pipeline.

Mirrors the reference's src/vamp/pointcloud.py:129-183
(problem_dict_to_pointcloud): sample primitive surfaces, filter (SCDF or
center-selective voxel), and build the requested pointcloud structure, with
per-stage timings as in the reference's benchmarking plumbing.
"""

from __future__ import annotations

import time

import numpy as np

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.pointcloud import filters, sampling
from vamp_mvt_tpu.robots import registry

# reference src/vamp/constants.py:11-23
ROBOT_FIRST_JOINT_LOCATIONS = {
    "baxter": [0.0, 0.0, 0.0],
    "fetch": [0.0, 0.0, 0.4],
    "ur5": [0.0, 0.0, 0.91],
    "panda": [0.0, 0.0, 0.0],
}
ROBOT_MAX_RADII = {"baxter": 1.31, "ur5": 1.2, "fetch": 1.5, "panda": 1.19}
POINT_RADIUS = 0.0025


def problem_to_pointcloud_env(
    robot: str,
    problem: dict,
    pc_repr: str = "mvt",
    samples_per_object: int = 10000,
    filter_type: str = "scdf",
    filter_radius: float = 0.02,
    voxel_filter_size: float = 0.0308,
    filter_cull: bool = True,
    builder: envmod.EnvironmentBuilder | None = None,
    pad: dict | None = None,
    kernel_pc: bool = True,
):
    """Returns (builder, original_pc, filtered_pc, filter_ns, build_ns).

    kernel_pc=True additionally builds the Pallas-kernel pointcloud
    structure (collision/pc_kernel.py) so planning runs the fused kernel
    path; its build time is included in build_ns (it is part of the
    per-problem preprocessing, like the reference's CAPT/MVT builds).
    """
    assert pc_repr in ("mvt", "capt")
    assert filter_type in ("scdf", "centervox")
    spec = registry.load(robot)

    original = sampling.problem_to_pointcloud(problem, samples_per_object)

    origin = ROBOT_FIRST_JOINT_LOCATIONS.get(robot, [0.0, 0.0, 0.0])
    cull_radius = ROBOT_MAX_RADII.get(robot, 1.4)
    bbox_lo = np.asarray(origin) - cull_radius
    bbox_hi = np.asarray(origin) + cull_radius

    t0 = time.perf_counter_ns()
    if filter_type == "scdf":
        filtered = filters.filter_scdf(
            original, filter_radius, cull_radius, origin, bbox_lo, bbox_hi, filter_cull
        )
    else:
        filtered = filters.filter_centervox(
            original, voxel_filter_size, cull_radius, origin, bbox_lo, bbox_hi
        )
    filter_ns = time.perf_counter_ns() - t0

    b = builder or envmod.EnvironmentBuilder()
    pad = dict(pad or {})
    pc_pad_chunks = pad.pop("pc_pad_chunks", None)
    if pc_repr == "mvt":
        build_ns = b.add_mvt_pointcloud(
            filtered, spec.min_radius, spec.max_radius, bbox_lo, bbox_hi,
            POINT_RADIUS, **pad,
        )
    else:
        build_ns = b.add_capt_pointcloud(
            filtered, spec.min_radius, spec.max_radius, POINT_RADIUS, **pad
        )
    if kernel_pc:
        from vamp_mvt_tpu.collision.pc_kernel import radius_classes

        build_ns += b.add_kernel_pointcloud(
            filtered, radius_classes(spec.sphere_radius), bbox_lo, bbox_hi,
            POINT_RADIUS, float(spec.max_radius), pad_chunks=pc_pad_chunks,
        )
    return b, original, filtered, filter_ns, build_ns
