"""User-facing API mirroring the reference's Python surface.

The reference exposes per-robot modules (`vamp.panda.rrtc(...)`,
`vamp.panda.simplify(...)`, `vamp.Environment().add_sphere(...)`; reference
src/vamp/__init__.py, bindings/robot_helper.hh:325-597).  This module provides
the same ergonomics on top of the TPU-native core:

    import vamp_mvt_tpu as vmt
    env = vmt.Environment()
    env.add_sphere(vmt.Sphere([0, 0, 0.5], 0.2))
    result = vmt.panda.rrtc(start, goal, env)
    simple = vmt.panda.simplify(result.path, result.path_length, env)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.ops import fk as fk_mod
from vamp_mvt_tpu.ops import fkcc as fkcc_mod
from vamp_mvt_tpu.planning import aorrtc as aorrtc_mod
from vamp_mvt_tpu.planning import fcit as fcit_mod
from vamp_mvt_tpu.planning import prm as prm_mod
from vamp_mvt_tpu.planning import rrtc as rrtc_mod
from vamp_mvt_tpu.planning import simplify as simplify_mod
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots import registry

# Re-exported settings/type names (reference __init__.py __all__)
RRTCSettings = rrtc_mod.RRTCSettings
SimplifySettings = simplify_mod.SimplifySettings
PRMSettings = prm_mod.PRMSettings
PRMNeighborParams = prm_mod.PRMStarNeighborParams
FCITSettings = fcit_mod.FCITSettings
AORRTCSettings = aorrtc_mod.AORRTCSettings
Attachment = fkcc_mod.make_attachment


def Sphere(center, radius):
    return ("sphere", envmod.make_sphere(center, radius))


def Cuboid(center, euler_xyz, half_extents):
    return ("cuboid", envmod.make_cuboid(center, euler_xyz, half_extents))


def Cylinder(center, euler_xyz, radius, length):
    return ("capsule", envmod.make_capsule_center(center, euler_xyz, radius, length))


def Capsule(p1, p2, radius):
    return ("capsule", envmod.make_capsule_endpoints(p1, p2, radius))


class Environment:
    """Reference-style environment wrapper over EnvironmentBuilder."""

    def __init__(self):
        self._b = envmod.EnvironmentBuilder()
        self._built = None

    def _invalidate(self):
        self._built = None

    def add_sphere(self, shape):
        kind, arr = shape
        assert kind == "sphere"
        self._b.add_sphere(arr[:3], arr[3])
        self._invalidate()

    def add_cuboid(self, shape):
        kind, arr = shape
        assert kind == "cuboid"
        self._b.add_cuboid(arr)
        self._invalidate()

    def add_capsule(self, shape):
        kind, arr = shape
        assert kind == "capsule"
        self._b.add_capsule(arr)
        self._invalidate()

    def add_heightfield(self, meta, data):
        self._b.add_heightfield(meta, data)
        self._invalidate()

    def add_mvt_pointcloud(self, points, r_min, r_max, ws_min, ws_max, r_point):
        ns = self._b.add_mvt_pointcloud(points, r_min, r_max, ws_min, ws_max, r_point)
        self._invalidate()
        return ns

    def add_capt_pointcloud(self, points, r_min, r_max, r_point):
        ns = self._b.add_capt_pointcloud(points, r_min, r_max, r_point)
        self._invalidate()
        return ns

    def attach(self, attachment):
        self._b.attach(attachment)
        self._invalidate()

    def build(self):
        if self._built is None:
            self._built = self._b.build()
        return self._built


def _as_env(env):
    if isinstance(env, Environment):
        return env.build()
    if isinstance(env, envmod.EnvironmentBuilder):
        return env.build()
    return env


class Halton:
    """Reference-style sampler handle: reset/skip map to index offsets
    (bindings/robot_helper.hh:360-379)."""

    def __init__(self):
        self.offset = 0

    def reset(self):
        self.offset = 0

    def skip(self, n: int):
        self.offset += int(n)


class RobotModule:
    """Per-robot namespace (reference bindings/robot_helper.hh:325-597)."""

    def __init__(self, name: str):
        self.name = name
        self._spec = None

    @property
    def spec(self):
        if self._spec is None:
            self._spec = registry.load(self.name)
        return self._spec

    # --- info -----------------------------------------------------------
    def dimension(self):
        return self.spec.dimension

    def resolution(self):
        return self.spec.resolution

    def n_spheres(self):
        return self.spec.n_spheres

    def space_measure(self):
        return self.spec.space_measure()

    def joint_names(self):
        return list(self.spec.joint_names)

    def min_max_radii(self):
        return self.spec.min_radius, self.spec.max_radius

    def halton(self):
        return Halton()

    # --- kinematics -----------------------------------------------------
    def fk(self, config):
        """Collision spheres at a configuration: (S, 4) x,y,z,r."""
        q = jnp.asarray(np.asarray(config, np.float32))[None]
        centers = np.asarray(fk_mod.sphere_positions(self.spec, q))[0]
        return np.concatenate([centers, self.spec.sphere_radius[:, None]], axis=1)

    def eefk(self, config):
        """End-effector pose: (R (3,3), t (3,))."""
        q = jnp.asarray(np.asarray(config, np.float32))[None]
        R, t = fk_mod.eefk(self.spec, q)
        return np.asarray(R)[0], np.asarray(t)[0]

    # --- validation -----------------------------------------------------
    def validate(self, config, env, check_bounds: bool = False):
        """Config validity: self/env collision, optionally joint limits
        (reference robot_helper.hh:255-267; check_bounds defaults false
        there too)."""
        spec = self.spec
        q = np.asarray(config, np.float32)
        if check_bounds and (
            (q < spec.limits_low).any() or (q > spec.limits_high).any()
        ):
            return False
        return bool(fkcc_mod.fkcc(spec, _as_env(env), jnp.asarray(q)[None])[0])

    def validate_motion(self, a, b, env):
        spec = self.spec
        span = float(np.linalg.norm(spec.limits_high - spec.limits_low))
        num = validate_mod.n_points_bound(spec, span)
        return bool(
            validate_mod.validate_motion(
                spec, _as_env(env), jnp.asarray(a, jnp.float32),
                jnp.asarray(b, jnp.float32), num,
            )
        )

    def debug(self, config, env):
        """Colliding sphere indices per environment-shape group + self pairs
        (the reference's fkcc_debug returns names; we return indices)."""
        spec = self.spec
        env = _as_env(env)
        q = jnp.asarray(np.asarray(config, np.float32))[None]
        centers = fk_mod.sphere_positions(spec, q)
        radii = jnp.asarray(spec.sphere_radius)
        env_hit = np.asarray(
            fkcc_mod.env_collision(env, centers[:, :, None, :], radii[:, None])
        )[0]
        pairs = spec.self_collision_pairs
        c = np.asarray(centers)[0]
        d2 = np.sum((c[pairs[:, 0]] - c[pairs[:, 1]]) ** 2, axis=1)
        rs = spec.sphere_radius[pairs[:, 0]] + spec.sphere_radius[pairs[:, 1]]
        self_hits = pairs[d2 < rs * rs]
        return {
            "env_colliding_spheres": np.flatnonzero(env_hit).tolist(),
            "self_colliding_pairs": [tuple(map(int, p)) for p in self_hits],
        }

    def filter_self_from_pointcloud(self, points, config, env, point_radius=0.0025):
        """Drop points colliding with the robot at `config` or the environment
        (reference robot_helper.hh:284-322)."""
        spec = self.spec
        env = _as_env(env)
        pts = jnp.asarray(np.asarray(points, np.float32).reshape(-1, 3))
        q = jnp.asarray(np.asarray(config, np.float32))[None]
        centers = np.asarray(fk_mod.sphere_positions(spec, q))[0]
        d2 = np.sum(
            (np.asarray(pts)[:, None, :] - centers[None, :, :]) ** 2, axis=-1
        )
        rs = spec.sphere_radius[None, :] + point_radius
        robot_hit = (d2 < rs * rs).any(axis=1)
        r = jnp.full(pts.shape[0], point_radius)
        env_hit = np.asarray(fkcc_mod.env_collision(env, pts[:, None, :], r[:, None]))
        return np.asarray(pts)[~(robot_hit | env_hit)]

    # --- planners -------------------------------------------------------
    def _plan_args(self, start, goals, sampler):
        spec = self.spec
        start = np.asarray(start, np.float32)
        goals = np.asarray(goals, np.float32)
        if goals.ndim == 1:
            goals = goals[None]
        offset = sampler.offset if isinstance(sampler, Halton) else int(sampler or 0)
        return start, goals, offset

    def default_rrtc_settings(self, **kw):
        kw.setdefault("range", registry.RRT_RANGES.get(self.name, 1.0))
        kw.setdefault("max_iterations", 4096)
        kw.setdefault("max_samples", 4096)
        kw.setdefault("max_path", 96)
        kw.setdefault("samples_per_step", 8)
        kw.setdefault("connect_segments", 4)
        return RRTCSettings(**kw)

    def rrtc(self, start, goals, env, settings=None, sampler=None):
        spec = self.spec
        settings = settings or self.default_rrtc_settings()
        start, goals, offset = self._plan_args(start, goals, sampler)
        G = goals.shape[0]
        fn = _jit_cache(
            ("rrtc", self.name, settings, G),
            lambda: jax.jit(
                lambda e, s, g, m, o: rrtc_mod.plan(spec, e, s, g, m, settings, o)
            ),
        )
        return fn(
            _as_env(env), jnp.asarray(start), jnp.asarray(goals),
            jnp.ones(G, bool), jnp.int32(offset),
        )

    def prm(self, start, goals, env, settings=None, sampler=None):
        start, goals, offset = self._plan_args(start, goals, sampler)
        return prm_mod.solve(self.spec, _as_env(env), start, goals, settings, offset)

    def fcit(self, start, goals, env, settings=None, sampler=None):
        start, goals, offset = self._plan_args(start, goals, sampler)
        return fcit_mod.solve(self.spec, _as_env(env), start, goals, settings, offset)

    def aorrtc(self, start, goals, env, settings=None, sampler=None):
        start, goals, offset = self._plan_args(start, goals, sampler)
        if settings is None:
            settings = AORRTCSettings(rrtc=self.default_rrtc_settings())
        res, iters = aorrtc_mod.solve(
            self.spec, _as_env(env), start, goals, settings, offset
        )
        return res

    def roadmap(self, start, goal, env, settings=None, sampler=None):
        start = np.asarray(start, np.float32)
        goal = np.asarray(goal, np.float32)
        offset = sampler.offset if isinstance(sampler, Halton) else int(sampler or 0)
        return prm_mod.build_roadmap(
            self.spec, _as_env(env), start, goal, settings, offset
        )

    def simplify(self, path, path_length, env, settings=None, sampler=None):
        spec = self.spec
        settings = settings or SimplifySettings()
        fn = _jit_cache(
            ("simplify", self.name, settings, np.asarray(path).shape),
            lambda: jax.jit(
                lambda e, p, l: simplify_mod.simplify(spec, e, p, l, settings)
            ),
        )
        return fn(_as_env(env), jnp.asarray(path), jnp.int32(path_length))


_JIT_CACHE: dict = {}


def _jit_cache(key, make):
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = make()
    return _JIT_CACHE[key]


def png_to_heightfield(filename, center, scaling):
    """PNG -> heightfield arrays (reference src/vamp/__init__.py:54-66)."""
    from PIL import Image

    image = Image.open(filename).convert("L")
    array = np.asarray(image) / 255.0
    array = np.flip(array, axis=0)
    return envmod.make_heightfield(center, scaling, array)


ROBOTS = list(registry.ROBOTS)

sphere = RobotModule("sphere")
ur5 = RobotModule("ur5")
panda = RobotModule("panda")
fetch = RobotModule("fetch")
baxter = RobotModule("baxter")
