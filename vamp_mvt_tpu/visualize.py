"""Visualization and result-reporting utilities.

The reference's PyBulletSimulator (src/vamp/pybullet_interface.py:39-415)
mirrors environments and animates paths in PyBullet.  Here:

- `PyBulletVisualizer`: the same role when pybullet is installed (URDF load,
  shape mirroring, path animation); raises a clear error otherwise.
- matplotlib fallbacks that need no simulator: 3D environment/workspace plots,
  joint-trajectory plots, roadmap plots — enough to eyeball solutions on a
  headless TPU host.
- `results_to_dict` / `results_dataframe`: pandas result records mirroring
  reference src/vamp/__init__.py:191-228.
"""

from __future__ import annotations

import numpy as np


def results_to_dict(plan_result, simp_result=None) -> dict:
    """Per-problem record (reference src/vamp/__init__.py:191-228)."""
    solved = bool(np.asarray(plan_result.solved))
    data = {
        "planning_iterations": int(plan_result.iterations),
        "solved": solved,
        "planning_graph_size": int(plan_result.size_start)
        + int(plan_result.size_goal),
        "initial_path_vertices": int(plan_result.path_length),
        "initial_path_cost": float(plan_result.cost) if solved else float("inf"),
    }
    if simp_result is not None:
        data.update(
            simplified_path_vertices=int(simp_result.path_length),
            simplified_path_cost=float(simp_result.cost),
        )
    else:
        data.update(
            simplified_path_vertices=data["initial_path_vertices"],
            simplified_path_cost=data["initial_path_cost"],
        )
    return data


def results_dataframe(suite_result):
    """Whole-suite pandas DataFrame from a bench.mbm.SuiteResult."""
    import pandas as pd

    p, s = suite_result.plan, suite_result.simplified
    return pd.DataFrame(
        {
            "problem": [n for n, _ in suite_result.names],
            "index": [i for _, i in suite_result.names],
            "valid": suite_result.valid,
            "solved": np.asarray(p.solved),
            "planning_iterations": np.asarray(p.iterations),
            "planning_graph_size": np.asarray(p.size_start)
            + np.asarray(p.size_goal),
            "initial_path_cost": np.asarray(p.cost),
            "simplified_path_cost": np.asarray(s.cost),
            "initial_path_vertices": np.asarray(p.path_length),
            "simplified_path_vertices": np.asarray(s.path_length),
        }
    )


def plot_workspace(spec, env=None, paths=(), out_path=None, n_samples=40):
    """3D scatter of environment shapes + end-effector traces of paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vamp_mvt_tpu.ops import fk
    import jax.numpy as jnp

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")

    if env is not None:
        e = env.build() if hasattr(env, "build") else env
        sph = np.asarray(e.spheres)
        real = sph[:, 0] < 1e7
        if real.any():
            ax.scatter(*sph[real, :3].T, s=2000 * sph[real, 3] ** 2, alpha=0.3,
                       c="tab:red", label="spheres")
        for name, arr in [("cuboids", e.cuboids), ("z_cuboids", e.z_cuboids)]:
            a = np.asarray(arr)
            real = a[:, 0] < 1e7
            if real.any():
                ax.scatter(*a[real, :3].T, marker="s", s=60, alpha=0.5,
                           c="tab:orange")

    for path in paths:
        path = np.asarray(path)
        # interpolate and trace the end effector
        ts = np.linspace(0, len(path) - 1, n_samples)
        lo = np.floor(ts).astype(int)
        hi = np.minimum(lo + 1, len(path) - 1)
        frac = (ts - lo)[:, None]
        qs = path[lo] * (1 - frac) + path[hi] * frac
        _, ee = fk.eefk(spec, jnp.asarray(qs, jnp.float32))
        ee = np.asarray(ee)
        ax.plot(*ee.T, "-o", markersize=2)

    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_joint_trajectories(path, path_length=None, out_path=None):
    """Per-joint trajectory plot of a (padded) path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = np.asarray(path)
    if path_length is not None:
        path = path[: int(path_length)]
    fig, ax = plt.subplots(figsize=(8, 4))
    for j in range(path.shape[1]):
        ax.plot(path[:, j], "-o", markersize=3, label=f"q{j}")
    ax.set_xlabel("waypoint"); ax.set_ylabel("joint value (rad)")
    ax.legend(ncol=4, fontsize=8)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_roadmap(roadmap, out_path=None):
    """3D roadmap plot (first three configuration dimensions)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    v = np.asarray(roadmap.vertices)
    ax.scatter(*v[:, :3].T, s=4)
    for i, j in roadmap.edges[:5000]:
        seg = v[[i, j], :3]
        ax.plot(*seg.T, "k-", linewidth=0.2, alpha=0.4)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


class PyBulletVisualizer:
    """PyBullet mirror of the reference PyBulletSimulator (requires pybullet)."""

    def __init__(self, urdf_path: str, gui: bool = False):
        try:
            import pybullet as pb
            import pybullet_utils.bullet_client as bc
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "pybullet is not installed; use the matplotlib helpers "
                "(plot_workspace/plot_joint_trajectories) instead"
            ) from e
        self._pb = pb
        self.client = bc.BulletClient(pb.GUI if gui else pb.DIRECT)
        self.robot = self.client.loadURDF(urdf_path, useFixedBase=True)
        self._joints = [
            i
            for i in range(self.client.getNumJoints(self.robot))
            if self.client.getJointInfo(self.robot, i)[2] != pb.JOINT_FIXED
        ]

    def set_configuration(self, q):
        for ji, qi in zip(self._joints, np.asarray(q)):
            self.client.resetJointState(self.robot, ji, float(qi))

    def add_sphere(self, center, radius, rgba=(0.8, 0.2, 0.2, 0.6)):
        vs = self.client.createVisualShape(
            self._pb.GEOM_SPHERE, radius=radius, rgbaColor=rgba
        )
        return self.client.createMultiBody(
            baseVisualShapeIndex=vs, basePosition=list(center)
        )

    def animate(self, path, steps_per_segment: int = 20, callback=None):
        path = np.asarray(path)
        for a, b in zip(path[:-1], path[1:]):
            for t in np.linspace(0, 1, steps_per_segment):
                q = a * (1 - t) + b * t
                self.set_configuration(q)
                if callback:
                    callback(q)
