"""vamp_mvt_tpu — a TPU-native motion-planning framework.

A from-scratch re-derivation of VAMP + the MVT fork (chingchennn/vamp_mvt) for
TPU hardware: batched forward kinematics and collision checking as fused
XLA/Pallas programs, lockstep batched sampling-based planners, pointcloud
collision structures (MVT/CAPT), and data-parallel scaling over device meshes.

Public surface mirrors the reference's Python API:

    import vamp_mvt_tpu as vmt
    env = vmt.Environment()
    env.add_sphere(vmt.Sphere([0.5, 0, 0.5], 0.2))
    result = vmt.panda.rrtc(start, goal, env)
"""

import os as _os

import jax as _jax

# Persistent compilation cache: planner while-loop programs take minutes to
# compile here; cache them across processes (opt out with
# VAMP_MVT_TPU_NO_COMPCACHE=1).
if _os.environ.get("VAMP_MVT_TPU_NO_COMPCACHE") != "1":
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/vamp_mvt_tpu_jax"),
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from vamp_mvt_tpu.api import (  # noqa: F401
    AORRTCSettings,
    Attachment,
    Capsule,
    Cuboid,
    Cylinder,
    Environment,
    FCITSettings,
    Halton,
    PRMNeighborParams,
    PRMSettings,
    ROBOTS,
    RRTCSettings,
    RobotModule,
    SimplifySettings,
    Sphere,
    baxter,
    fetch,
    panda,
    png_to_heightfield,
    sphere,
    ur5,
)

robots = ROBOTS

__version__ = "0.1.0"
