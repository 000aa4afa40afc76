"""Vectorized MBM batch assembly equals the per-problem builder path.

bench.mbm.build_batch was vectorized in round 3 (one numpy pass + one device
transfer per field instead of ~5 arrays x n_problems transfers).  This checks
the new assembler against problem_to_builder(p).build(caps) stacking on
synthetic problems covering every object type and the box-problem
cylinder->cuboid hack (reference src/vamp/__init__.py:142-188 semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.collision import environment as envmod


def _synthetic_problems(n=12, seed=0):
    rng = np.random.default_rng(seed)
    problems = []
    for i in range(n):
        kind = ("box", "cage", "table_pick")[i % 3]
        p = {"problem": kind, "sphere": [], "cylinder": [], "box": [],
             "start": rng.uniform(-1, 1, 7).tolist(),
             "goals": [rng.uniform(-1, 1, 7).tolist()
                       for _ in range(1 + i % 2)]}
        for _ in range(rng.integers(0, 3)):
            p["sphere"].append(
                {"position": rng.uniform(-1, 1, 3).tolist(),
                 "radius": float(rng.uniform(0.05, 0.3))}
            )
        for j in range(rng.integers(0, 3)):
            e = rng.uniform(-np.pi, np.pi, 3)
            if j == 0:
                e[:] = 0.0  # exercise the z-aligned routing
            p["cylinder"].append(
                {"position": rng.uniform(-1, 1, 3).tolist(),
                 "orientation_euler_xyz": e.tolist(),
                 "radius": float(rng.uniform(0.05, 0.2)),
                 "length": float(rng.uniform(0.2, 0.8))}
            )
        for j in range(rng.integers(0, 4)):
            e = rng.uniform(-np.pi, np.pi, 3)
            if j == 0:
                e[:] = 0.0
            p["box"].append(
                {"position": rng.uniform(-1, 1, 3).tolist(),
                 "orientation_euler_xyz": e.tolist(),
                 "half_extents": rng.uniform(0.05, 0.4, 3).tolist()}
            )
        problems.append(p)
    return problems


def test_vectorized_batch_matches_builder_path():
    problems = _synthetic_problems()
    builders = [mbm.problem_to_builder(p) for p in problems]
    caps = {
        "n_spheres": max(len(b.spheres) for b in builders),
        "n_capsules": max(len(b.capsules) for b in builders),
        "n_z_capsules": max(len(b.z_capsules) for b in builders),
        "n_cuboids": max(len(b.cuboids) for b in builders),
        "n_z_cuboids": max(len(b.z_cuboids) for b in builders),
    }
    ref = envmod.stack_environments([b.build(**caps) for b in builders])
    envs, starts, goals, masks = mbm.build_batch(problems)
    for f in ("spheres", "capsules", "z_capsules", "cuboids", "z_cuboids"):
        np.testing.assert_array_equal(
            np.asarray(getattr(envs, f)), np.asarray(getattr(ref, f)),
            err_msg=f,
        )
    assert np.asarray(starts).shape == (12, 7)
    G = max(len(p["goals"]) for p in problems)
    assert np.asarray(goals).shape == (12, G, 7)
    for i, p in enumerate(problems):
        np.testing.assert_array_equal(
            np.asarray(masks)[i], np.arange(G) < len(p["goals"])
        )
        np.testing.assert_allclose(
            np.asarray(starts)[i], np.asarray(p["start"], np.float32)
        )
