"""Environment of collision primitives as dense struct-of-arrays.

The reference holds shapes in sorted std::vectors and early-exits on a
min_distance ordering (src/impl/vamp/collision/environment.hh:15-88,
validity.hh:46-158).  On TPU the branchy early-exit does not pay; instead the
environment is a pytree of fixed-capacity dense arrays, padded with inert
shapes that can never collide, and every sphere×shape pair is evaluated
dense-and-masked in one fused program.

Shape parameterizations match the reference exactly
(src/impl/vamp/collision/shapes.hh, factory.hh):
  sphere:  (x, y, z, r)
  capsule: (x1, y1, z1, xv, yv, zv, r, rdv)  with rdv = 1/|v|^2
  cuboid:  (center(3), axis_1(3), axis_2(3), axis_3(3), half_extents(3))
  heightfield: per-cell height grid with scale/offset (shapes.hh:249-312)
Z-aligned capsules/cuboids are split out as in the reference bindings
(bindings/environment.cc:121-147) and use the cheaper specialized tests.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

# Inert padding: far away, zero radius -> distances are huge positive.
_FAR = 1.0e8


class Environment(NamedTuple):
    """Dense SoA environment; a JAX pytree usable under jit/vmap/shard_map.

    All arrays may carry leading batch dimensions (batched environments for a
    batch of problems), created via jax.tree_util stacking.
    """

    spheres: jnp.ndarray      # (..., Ns, 4)
    capsules: jnp.ndarray     # (..., Nc, 8)
    z_capsules: jnp.ndarray   # (..., Nzc, 8)
    cuboids: jnp.ndarray      # (..., Nb, 15)
    z_cuboids: jnp.ndarray    # (..., Nzb, 15)
    hf_meta: jnp.ndarray      # (..., Nh, 10): x, y, z, xs, ys, zs, xd, yd, xd2, yd2
    hf_data: jnp.ndarray      # (..., Nh, max_cells)
    mvt: object = None        # MVTData pointcloud structure (collision/mvt.py)
    capt: object = None       # CAPTData pointcloud structure (collision/capt.py)
    pck: object = None        # PCKernelData (collision/pc_kernel.py): the
                              #   Pallas-kernel-resident pointcloud form
    attachment: object = None # Attachment (end-effector payload spheres)


# ---------------------------------------------------------------------------
# Host-side builders (numpy; mirror reference factory.hh semantics)
# ---------------------------------------------------------------------------


def _euler_xyz_matrix(rho: float, theta: float, phi: float) -> np.ndarray:
    """Reference factory.hh:37-40: R = Rz(phi) Ry(theta) Rx(rho)."""
    cr, sr = math.cos(rho), math.sin(rho)
    cp, sp = math.cos(theta), math.sin(theta)
    cy, sy = math.cos(phi), math.sin(phi)
    rz = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    ry = np.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    rx = np.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    return rz @ ry @ rx


def make_sphere(center, radius) -> np.ndarray:
    return np.array([*center, radius], dtype=np.float32)


def make_cuboid(center, euler_xyz, half_extents) -> np.ndarray:
    """Cuboid from center + Euler XYZ + half extents (factory.hh:26-60)."""
    R = _euler_xyz_matrix(*euler_xyz)
    return np.array(
        [*center, *R[:, 0], *R[:, 1], *R[:, 2], *half_extents], dtype=np.float32
    )


def make_capsule_endpoints(p1, p2, radius) -> np.ndarray:
    """Capsule/cylinder from endpoints (factory.hh cylinder::endpoints)."""
    p1 = np.asarray(p1, dtype=np.float64)
    v = np.asarray(p2, dtype=np.float64) - p1
    rdv = 1.0 / float(v @ v)
    return np.array([*p1, *v, radius, rdv], dtype=np.float32)


def make_capsule_center(center, euler_xyz, radius, length) -> np.ndarray:
    """Capsule from center + Euler XYZ + radius + length (factory.hh cylinder::center)."""
    R = _euler_xyz_matrix(*euler_xyz)
    c = np.asarray(center, dtype=np.float64)
    half = R @ np.array([0.0, 0.0, length / 2.0])
    return make_capsule_endpoints(c + half, c - half, radius)


def make_heightfield(center, scale, grid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Heightfield meta+data (reference shapes.hh:249-312, factory.hh:364-385).

    grid: (H, W) row-major heights; scale = (sx, sy, sz) world units *per cell*
    (and per height unit for z).  Stored scales are reciprocals, exactly as the
    reference factory does (factory.hh:380-382); the query maps world xy to a
    cell via cell = (center - p) / scale + dim/2 (sphere_heightfield.hh:20-23).
    """
    h, w = grid.shape
    sx, sy, sz = scale
    meta = np.array(
        [
            center[0],
            center[1],
            center[2],
            1.0 / sx,
            1.0 / sy,
            1.0 / sz,
            float(w),     # xd
            float(h),     # yd
            float(w // 2),  # xd2 (integer halving, shapes.hh:289)
            float(h // 2),  # yd2
        ],
        dtype=np.float32,
    )
    return meta, grid.astype(np.float32).reshape(-1)


_INERT = {
    "spheres": np.array([_FAR, _FAR, _FAR, 0.0], dtype=np.float32),
    "capsules": np.array([_FAR, _FAR, _FAR, 0.0, 0.0, 1.0, 0.0, 1.0], dtype=np.float32),
    "cuboids": np.array(
        [_FAR, _FAR, _FAR, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0], dtype=np.float32
    ),
}


@dataclasses.dataclass
class EnvironmentBuilder:
    """Accumulates shapes host-side, emits a padded dense Environment.

    Mirrors the reference Python Environment API (bindings/environment.cc:111+):
    add_sphere / add_capsule (auto z-aligned routing) / add_cuboid (auto) /
    add_heightfield.
    """

    spheres: list = dataclasses.field(default_factory=list)
    capsules: list = dataclasses.field(default_factory=list)
    z_capsules: list = dataclasses.field(default_factory=list)
    cuboids: list = dataclasses.field(default_factory=list)
    z_cuboids: list = dataclasses.field(default_factory=list)
    heightfields: list = dataclasses.field(default_factory=list)
    mvt: object = None
    capt: object = None
    pck: object = None
    attachment: object = None

    def add_sphere(self, center, radius):
        self.spheres.append(make_sphere(center, radius))
        return self

    def add_capsule(self, arr: np.ndarray):
        # z-aligned iff xv == yv == 0 (reference bindings/environment.cc:138)
        if arr[3] == 0.0 and arr[4] == 0.0:
            self.z_capsules.append(arr)
        else:
            self.capsules.append(arr)
        return self

    def add_cuboid(self, arr: np.ndarray):
        # z-aligned iff axis_3_z == 1 (reference bindings/environment.cc:124)
        if arr[11] == 1.0:
            self.z_cuboids.append(arr)
        else:
            self.cuboids.append(arr)
        return self

    def add_heightfield(self, meta: np.ndarray, data: np.ndarray):
        self.heightfields.append((meta, data))
        return self

    def attach(self, attachment):
        """Attach end-effector payload spheres (reference Environment
        attachments, collision/attachments.hh:12-57)."""
        self.attachment = attachment
        return self

    def add_mvt_pointcloud(
        self,
        points,
        r_min: float,
        r_max: float,
        workspace_min,
        workspace_max,
        r_point: float,
        **pad,
    ) -> int:
        """Build + attach an MVT structure; returns build time in ns
        (reference bindings/environment.cc:164-177)."""
        import time

        from vamp_mvt_tpu.collision.mvt import build_mvt

        t0 = time.perf_counter_ns()
        self.mvt = build_mvt(
            points, r_min, r_max, workspace_min, workspace_max, r_point, **pad
        )
        return time.perf_counter_ns() - t0

    def add_kernel_pointcloud(
        self,
        points,
        class_radii,
        workspace_min,
        workspace_max,
        r_point: float,
        max_radius: float,
        pad_chunks: int | None = None,
    ) -> int:
        """Build + attach the Pallas-kernel pointcloud structure
        (collision/pc_kernel.py); returns build time in ns."""
        import time

        from vamp_mvt_tpu.collision.pc_kernel import build_pc_kernel

        t0 = time.perf_counter_ns()
        self.pck = build_pc_kernel(
            points, class_radii, workspace_min, workspace_max, r_point,
            max_radius, pad_chunks=pad_chunks,
        )
        return time.perf_counter_ns() - t0

    def add_capt_pointcloud(
        self, points, r_min: float, r_max: float, r_point: float, **pad
    ) -> int:
        """Build + attach a CAPT structure; returns build time in ns
        (reference bindings/environment.cc:152-163)."""
        import time

        from vamp_mvt_tpu.collision.capt import build_capt

        t0 = time.perf_counter_ns()
        self.capt = build_capt(points, r_min, r_max, r_point, **pad)
        return time.perf_counter_ns() - t0

    def build(
        self,
        n_spheres: int | None = None,
        n_capsules: int | None = None,
        n_z_capsules: int | None = None,
        n_cuboids: int | None = None,
        n_z_cuboids: int | None = None,
        n_heightfields: int | None = None,
        hf_cells: int | None = None,
    ) -> Environment:
        def pad(rows, cap, inert):
            cap = len(rows) if cap is None else cap
            cap = max(cap, len(rows))
            out = np.tile(inert, (max(cap, 1), 1))
            if not cap:
                out = out[:0]
            for i, r in enumerate(rows):
                out[i] = r
            return jnp.asarray(out)

        nh = len(self.heightfields) if n_heightfields is None else n_heightfields
        cells = hf_cells
        if cells is None:
            cells = max((d.size for _, d in self.heightfields), default=0)
        hf_meta = np.zeros((nh, 10), dtype=np.float32)
        # Inert heightfield: z offset far below so z - r - zh is always positive.
        hf_meta[:, 2] = -_FAR
        hf_meta[:, 6] = 1.0
        hf_meta[:, 7] = 1.0
        hf_data = np.zeros((nh, max(cells, 1) if nh else 0), dtype=np.float32)
        for i, (m, d) in enumerate(self.heightfields):
            hf_meta[i] = m
            hf_data[i, : d.size] = d

        return Environment(
            spheres=pad(self.spheres, n_spheres, _INERT["spheres"]),
            capsules=pad(self.capsules, n_capsules, _INERT["capsules"]),
            z_capsules=pad(self.z_capsules, n_z_capsules, _INERT["capsules"]),
            cuboids=pad(self.cuboids, n_cuboids, _INERT["cuboids"]),
            z_cuboids=pad(self.z_cuboids, n_z_cuboids, _INERT["cuboids"]),
            hf_meta=jnp.asarray(hf_meta),
            hf_data=jnp.asarray(hf_data),
            mvt=self.mvt,
            capt=self.capt,
            pck=self.pck,
            attachment=self.attachment,
        )


def empty_environment() -> Environment:
    return EnvironmentBuilder().build()


def stack_environments(envs: list[Environment]) -> Environment:
    """Stack same-capacity environments into a batched Environment."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *envs)
