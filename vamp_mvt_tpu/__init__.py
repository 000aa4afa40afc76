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
