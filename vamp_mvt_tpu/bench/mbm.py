"""MotionBenchMaker problem suite: loading, environment building, batch runner.

Replaces the reference's evaluate_mbm.py + problem_dict_to_vamp pipeline
(scripts/evaluate_mbm.py, src/vamp/__init__.py:142-188) with a batched runner:
every problem of a robot's suite is planned AND simplified in one jitted,
vmapped program, so the whole 700-problem suite is a few device dispatches.

Problem data comes from the MoveIt-YAML tarballs shipped with the reference
(resources/<robot>/problems.tar.bz2, format per resources/problem_tar_to_pkl_json.py);
set VAMP_MVT_TPU_RESOURCES to point elsewhere.  Parsed problems are cached as
a pickle next to this package.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import pickle
import re
import tarfile
import time
from collections import defaultdict
from pathlib import Path

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.ops import fkcc
from vamp_mvt_tpu.planning import rrtc, simplify
from vamp_mvt_tpu.robots import registry

RESOURCES = Path(os.environ.get("VAMP_MVT_TPU_RESOURCES", "/root/reference/resources"))

# The 7 standard MBM scenarios making up the published 700-problem Panda suite
# (resources/README.md:124-148); the tarball also ships *_two/*_three extras.
STANDARD_SCENARIOS = (
    "bookshelf_small",
    "bookshelf_tall",
    "bookshelf_thin",
    "box",
    "cage",
    "table_pick",
    "table_under_pick",
)
CACHE_DIR = Path(os.environ.get("VAMP_MVT_TPU_CACHE", Path.home() / ".cache" / "vamp_mvt_tpu"))

try:
    from yaml import CLoader as _Loader
except ImportError:  # pragma: no cover
    from yaml import SafeLoader as _Loader


# ---------------------------------------------------------------------------
# Problem parsing (mirrors resources/problem_tar_to_pkl_json.py semantics)
# ---------------------------------------------------------------------------


def _quat_matrix(q):
    """xyzw-ordered? MoveIt YAML stores [x, y, z, w]."""
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    if n == 0:
        return np.eye(3)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _euler_xyz_from_matrix(R):
    """Euler XYZ (rho, theta, phi) with R = Rz(phi) Ry(theta) Rx(rho)."""
    theta = -np.arcsin(np.clip(R[2, 0], -1.0, 1.0))
    c = np.cos(theta)
    if abs(c) > 1e-8:
        rho = np.arctan2(R[2, 1], R[2, 2])
        phi = np.arctan2(R[1, 0], R[0, 0])
    else:
        rho = np.arctan2(-R[1, 2], R[1, 1])
        phi = 0.0
    return [float(rho), float(theta), float(phi)]


def _tf(obj):
    pos = np.asarray(obj["position"], dtype=float)
    R = _quat_matrix(obj["orientation"])
    return pos, R


def _scene_objects(data):
    objects = {"sphere": [], "cylinder": [], "box": []}
    for co in data["world"]["collision_objects"]:
        base_p, base_r = (np.zeros(3), np.eye(3))
        if "pose" in co:
            base_p, base_r = _tf(co["pose"])
        prim = co["primitives"][0]
        pp, pr = _tf(co["primitive_poses"][0])
        pos = base_r @ pp + base_p
        R = base_r @ pr
        obj = {
            "name": co["id"],
            "position": pos.tolist(),
            "orientation_euler_xyz": _euler_xyz_from_matrix(R),
        }
        t = prim["type"]
        if t == "sphere":
            obj["radius"] = float(prim["dimensions"][0])
        elif t == "cylinder":
            obj["length"] = float(prim["dimensions"][0])
            obj["radius"] = float(prim["dimensions"][1])
        elif t == "box":
            obj["half_extents"] = [float(x) / 2 for x in prim["dimensions"]]
        else:
            raise RuntimeError(f"invalid primitive {t}")
        objects[{"sphere": "sphere", "cylinder": "cylinder", "box": "box"}[t]].append(obj)
    return objects


def _request(data, joints):
    js = data["start_state"]["joint_state"]
    start = [js["position"][js["name"].index(j)] for j in joints]
    cons = data["goal_constraints"][0]["joint_constraints"]
    names = [c["joint_name"] for c in cons]
    pos = [c["position"] for c in cons]
    goal = [pos[names.index(j)] for j in joints]
    return {"start": start, "goals": [goal]}


def load_problems(robot: str, use_cache: bool = True) -> dict:
    """Parse resources/<robot>/problems.tar.bz2 into the reference pkl layout."""
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    cache = CACHE_DIR / f"{robot}_problems.pkl"
    if use_cache and cache.exists():
        with open(cache, "rb") as f:
            return pickle.load(f)

    spec = registry.load(robot)
    joints = list(spec.joint_names)
    scenes, requests = defaultdict(list), defaultdict(list)
    tar = tarfile.open(RESOURCES / robot / "problems.tar.bz2", "r:bz2")
    for member in tar.getmembers():
        if not member.isfile():
            continue
        f = tar.extractfile(member)
        _, problem, filename = member.name.split("/")
        problem = problem.replace(f"_{robot}", "")
        data = yaml.load(f.read(), Loader=_Loader)
        index = int(re.findall(r"\d+", filename)[0])
        meta = {"index": index, "problem": problem}
        if "scene" in filename:
            scenes[problem].append(_scene_objects(data) | meta)
        elif "request" in filename:
            requests[problem].append(_request(data, joints) | meta)

    out = {"robot": robot, "joints": joints, "problems": {}}
    for k in scenes:
        out["problems"][k] = [
            {**s, **r}
            for s, r in zip(
                sorted(scenes[k], key=lambda e: e["index"]),
                sorted(requests[k], key=lambda e: e["index"]),
            )
        ]
    with open(cache, "wb") as f:
        pickle.dump(out, f)
    return out


def load_problems_pkl(path) -> dict:
    """Load a pre-converted problem pickle (the output layout of the
    reference's resources/robometrics_to_pkl_json.py and
    problem_tar_to_pkl_json.py): {robot, joints, problems: {name: [...]}}.

    Robometrics datasets (mpinets-1800, robometrics-mbm-800) are distributed
    through the external `robometrics` pip package; convert them with the
    reference script (or any tool emitting this layout) and pass the pickle
    here / via evaluate_mbm --problems_pkl.  Problems may carry a precomputed
    'valid' flag, which run_suite compares against its own validity check.
    """
    with open(path, "rb") as f:
        data = pickle.load(f)
    for plist in data["problems"].values():
        for prob in plist:
            prob.setdefault("sphere", [])
            prob.setdefault("cylinder", [])
            prob.setdefault("box", [])
    return data


def problem_to_builder(problem: dict) -> envmod.EnvironmentBuilder:
    """Environment construction, mirroring problem_dict_to_vamp
    (reference src/vamp/__init__.py:142-188, incl. the 'box' problem's
    cylinder->cuboid overapproximation hack)."""
    b = envmod.EnvironmentBuilder()
    for obj in problem["sphere"]:
        b.add_sphere(obj["position"], obj["radius"])
    if problem["problem"] == "box":
        for obj in problem["cylinder"]:
            b.add_cuboid(
                envmod.make_cuboid(
                    obj["position"],
                    obj["orientation_euler_xyz"],
                    [obj["radius"], obj["radius"], obj["length"] / 2],
                )
            )
    else:
        for obj in problem["cylinder"]:
            b.add_capsule(
                envmod.make_capsule_center(
                    obj["position"],
                    obj["orientation_euler_xyz"],
                    obj["radius"],
                    obj["length"],
                )
            )
    for obj in problem["box"]:
        b.add_cuboid(
            envmod.make_cuboid(
                obj["position"], obj["orientation_euler_xyz"], obj["half_extents"]
            )
        )
    return b


# ---------------------------------------------------------------------------
# Batch assembly and runner
# ---------------------------------------------------------------------------


def _euler_xyz_matrices(e: np.ndarray) -> np.ndarray:
    """(N, 3) Euler XYZ -> (N, 3, 3), R = Rz(phi) Ry(theta) Rx(rho) — the
    vectorized twin of environment._euler_xyz_matrix (factory.hh:37-40)."""
    cr, sr = np.cos(e[:, 0]), np.sin(e[:, 0])
    cp, sp = np.cos(e[:, 1]), np.sin(e[:, 1])
    cy, sy = np.cos(e[:, 2]), np.sin(e[:, 2])
    R = np.empty((len(e), 3, 3), np.float64)
    R[:, 0, 0] = cy * cp
    R[:, 0, 1] = cy * sp * sr - sy * cr
    R[:, 0, 2] = cy * sp * cr + sy * sr
    R[:, 1, 0] = sy * cp
    R[:, 1, 1] = sy * sp * sr + cy * cr
    R[:, 1, 2] = sy * sp * cr - cy * sr
    R[:, 2, 0] = -sp
    R[:, 2, 1] = cp * sr
    R[:, 2, 2] = cp * cr
    return R


def _assemble_batch_np(problems: list[dict]) -> dict[str, np.ndarray]:
    """Vectorized environment-batch assembly, equal to stacking
    problem_to_builder(p).build(caps) per problem but with ONE numpy pass per
    shape type instead of ~5 small arrays x len(problems) device transfers
    (each costs ~ms through the axon tunnel — this was 26s of the round-2
    'honest e2e' wall)."""
    B = len(problems)

    # gather object rows per type: (problem_idx, data...)
    sph_i, sph = [], []
    cap_i, cap_c, cap_e, cap_rl = [], [], [], []       # capsule cylinders
    boxcyl_i, boxcyl_c, boxcyl_e, boxcyl_h = [], [], [], []  # box-problem hack
    box_i, box_c, box_e, box_h = [], [], [], []
    for i, p in enumerate(problems):
        for o in p["sphere"]:
            sph_i.append(i)
            sph.append([*o["position"], o["radius"]])
        if p["problem"] == "box":
            for o in p["cylinder"]:
                boxcyl_i.append(i)
                boxcyl_c.append(o["position"])
                boxcyl_e.append(o["orientation_euler_xyz"])
                boxcyl_h.append([o["radius"], o["radius"], o["length"] / 2])
        else:
            for o in p["cylinder"]:
                cap_i.append(i)
                cap_c.append(o["position"])
                cap_e.append(o["orientation_euler_xyz"])
                cap_rl.append([o["radius"], o["length"]])
        for o in p["box"]:
            box_i.append(i)
            box_c.append(o["position"])
            box_e.append(o["orientation_euler_xyz"])
            box_h.append(o["half_extents"])

    def cuboid_rows(c, e, h):
        """(N,15) rows + z-aligned flags (environment.make_cuboid semantics)."""
        if not len(c):
            return np.zeros((0, 15), np.float32), np.zeros(0, bool)
        R = _euler_xyz_matrices(np.asarray(e, np.float64))
        rows = np.concatenate(
            [np.asarray(c, np.float64), R[:, :, 0], R[:, :, 1], R[:, :, 2],
             np.asarray(h, np.float64)], axis=1,
        ).astype(np.float32)
        return rows, rows[:, 11] == 1.0

    def capsule_rows(c, e, rl):
        """(N,8) rows + z flags (make_capsule_center -> endpoints)."""
        if not len(c):
            return np.zeros((0, 8), np.float32), np.zeros(0, bool)
        c = np.asarray(c, np.float64)
        rl = np.asarray(rl, np.float64)
        R = _euler_xyz_matrices(np.asarray(e, np.float64))
        half = R[:, :, 2] * (rl[:, 1:2] / 2.0)
        p1 = c + half
        v = -2.0 * half
        rdv = 1.0 / np.einsum("ij,ij->i", v, v)
        rows = np.concatenate(
            [p1, v, rl[:, 0:1], rdv[:, None]], axis=1
        ).astype(np.float32)
        return rows, rows[:, 3] == 0.0

    cub_rows, cub_z = cuboid_rows(
        boxcyl_c + box_c, boxcyl_e + box_e, boxcyl_h + box_h
    )
    cub_idx = np.asarray(boxcyl_i + box_i, np.int64)
    capr, capz = capsule_rows(cap_c, cap_e, cap_rl)
    cap_idx = np.asarray(cap_i, np.int64)
    sph_rows = np.asarray(sph, np.float32).reshape(-1, 4)
    sph_idx = np.asarray(sph_i, np.int64)

    def scatter(rows, idx, keep, inert, B):
        rows, idx = rows[keep], idx[keep]
        counts = np.bincount(idx, minlength=B) if len(idx) else np.zeros(B, int)
        cap = int(counts.max()) if len(idx) else 0
        out = np.tile(inert, (B, max(cap, 1), 1)).astype(np.float32)
        if not cap:
            return out[:, :0]
        # slot within problem: order of appearance (stable)
        slot = np.zeros(len(idx), np.int64)
        seen: dict[int, int] = {}
        for k, i in enumerate(idx):
            slot[k] = seen.get(i, 0)
            seen[i] = slot[k] + 1
        out[idx, slot] = rows
        return out

    inert_s = envmod._INERT["spheres"]
    inert_c = envmod._INERT["capsules"]
    inert_b = envmod._INERT["cuboids"]
    return {
        "spheres": scatter(sph_rows, sph_idx, np.ones(len(sph_idx), bool), inert_s, B),
        "capsules": scatter(capr, cap_idx, ~capz, inert_c, B),
        "z_capsules": scatter(capr, cap_idx, capz, inert_c, B),
        "cuboids": scatter(cub_rows, cub_idx, ~cub_z, inert_b, B),
        "z_cuboids": scatter(cub_rows, cub_idx, cub_z, inert_b, B),
    }


def build_batch(problems: list[dict], cache_key: str | None = None):
    """Stack per-problem environments padded to common capacities.

    Vectorized numpy assembly + one device transfer per field.  With a
    cache_key, the assembled arrays are memoized as an npz next to the
    problem pickle cache so warm runs skip assembly entirely."""
    arrs = None
    cache = None
    if cache_key is not None:
        CACHE_DIR.mkdir(parents=True, exist_ok=True)
        cache = CACHE_DIR / f"batch_{cache_key}.npz"
        if cache.exists():
            with np.load(cache) as z:
                arrs = {k: z[k] for k in z.files}
    if arrs is None:
        arrs = _assemble_batch_np(problems)
        G = max(len(p["goals"]) for p in problems)
        d = len(problems[0]["start"])
        starts = np.zeros((len(problems), d), np.float32)
        goals = np.zeros((len(problems), G, d), np.float32)
        masks = np.zeros((len(problems), G), bool)
        for i, p in enumerate(problems):
            starts[i] = p["start"]
            for g, goal in enumerate(p["goals"]):
                goals[i, g] = goal
                masks[i, g] = True
        arrs |= {"starts": starts, "goals": goals, "masks": masks}
        if cache is not None:
            np.savez(cache, **arrs)

    nh = len(problems)
    envs = envmod.Environment(
        spheres=jnp.asarray(arrs["spheres"]),
        capsules=jnp.asarray(arrs["capsules"]),
        z_capsules=jnp.asarray(arrs["z_capsules"]),
        cuboids=jnp.asarray(arrs["cuboids"]),
        z_cuboids=jnp.asarray(arrs["z_cuboids"]),
        hf_meta=jnp.zeros((nh, 0, 10), jnp.float32),
        hf_data=jnp.zeros((nh, 0, 0), jnp.float32),
    )
    return (
        envs,
        jnp.asarray(arrs["starts"]),
        jnp.asarray(arrs["goals"]),
        jnp.asarray(arrs["masks"]),
    )


_FN_CACHE: dict = {}


def _cached_fns(key, build):
    """Memoize jitted suite pipelines across run_suite calls: a fresh
    jax.jit wrapper per call would re-link its executable on first dispatch
    (seconds through the axon tunnel), which was most of the round-3
    'honest e2e' gap (plan 0.6s -> 6.5s on the second suite run)."""
    if key not in _FN_CACHE:
        _FN_CACHE[key] = build()
    return _FN_CACHE[key]


@functools.partial(jax.jit, static_argnums=0)
def _valid_fused(spec, envs, starts, goals, masks):
    """Start + goal validity in ONE device dispatch (collision-only, like
    the reference's check_bounds=false — see validate_configs)."""
    qall = jnp.concatenate([starts[:, None], goals], axis=1)  # (B, 1+G, d)
    free = jax.vmap(lambda e, q: fkcc.fkcc(spec, e, q))(envs, qall)
    return free[:, 0] & jnp.any(free[:, 1:] & masks, axis=1)


def validate_configs(spec, envs, configs, check_bounds: bool = False):
    """Config validity: self/env collision, optionally joint limits.

    check_bounds defaults to False to match the reference dataset's validity
    flags: robot_helper.hh:256 validate(..., check_bounds = false) is what
    problem_tar_to_pkl_json.py:84 uses, so boundary configurations (e.g.
    Fetch goals at exactly +/-pi on continuous joints) count as valid."""
    free = jax.vmap(lambda e, q: fkcc.fkcc(spec, e, q[None])[0])(envs, configs)
    if not check_bounds:
        return free
    lo = jnp.asarray(spec.limits_low)
    hi = jnp.asarray(spec.limits_high)
    in_bounds = jnp.all((configs >= lo) & (configs <= hi), axis=-1)
    return in_bounds & free


class SuiteResult:
    def __init__(self, names, plan_res, simp_res, valid, plan_time, simp_time):
        self.names = names
        self.plan = plan_res
        self.simplified = simp_res
        self.valid = np.asarray(valid)
        self.plan_time = plan_time
        self.simp_time = simp_time

    def summary(self) -> dict:
        solved = np.asarray(self.plan.solved) & self.valid
        total = len(self.valid)
        n_valid = int(self.valid.sum())
        n_solved = int(solved.sum())
        init_cost = np.asarray(self.plan.cost)[solved]
        simp_cost = np.asarray(self.simplified.cost)[solved]
        iters = np.asarray(self.plan.iterations)[solved]
        return {
            "total_problems": total,
            "valid_problems": n_valid,
            "solved_problems": n_solved,
            "solve_rate": n_solved / max(n_valid, 1),
            "median_initial_cost": float(np.median(init_cost)) if n_solved else None,
            "median_simplified_cost": float(np.median(simp_cost)) if n_solved else None,
            "median_iterations": float(np.median(iters)) if n_solved else None,
            "plan_wall_s": self.plan_time,
            "simplify_wall_s": self.simp_time,
            "problems_per_sec": total / max(self.plan_time + self.simp_time, 1e-9),
        }

    def percentile_table(self) -> str:
        """Percentile table mirroring the reference's evaluate_mbm output
        (scripts/evaluate_mbm.py:186-276): distributions over solved problems."""
        solved = np.asarray(self.plan.solved) & self.valid
        rows = []
        pcts = [50, 75, 95, 99]
        metrics = {
            "initial_cost": np.asarray(self.plan.cost)[solved],
            "simplified_cost": np.asarray(self.simplified.cost)[solved],
            "samples": np.asarray(self.plan.iterations)[solved],
            "graph_size": (
                np.asarray(self.plan.size_start) + np.asarray(self.plan.size_goal)
            )[solved],
            "initial_path_vertices": np.asarray(self.plan.path_length)[solved],
            "simplified_path_vertices": np.asarray(self.simplified.path_length)[solved],
        }
        header = f"{'metric':<26}" + "".join(f"{p:>10}%" for p in pcts) + f"{'mean':>11}"
        rows.append(header)
        for name, vals in metrics.items():
            if not len(vals):
                continue
            qs = np.percentile(vals, pcts)
            rows.append(
                f"{name:<26}"
                + "".join(f"{q:>11.2f}" for q in qs)
                + f"{vals.mean():>11.2f}"
            )
        s = self.summary()
        rows.append(
            f"Solved {s['solved_problems']} / Valid {s['valid_problems']} / "
            f"Total {s['total_problems']}"
        )
        return "\n".join(rows)


@jax.jit
def _gather_sub(tree, take):
    return jax.tree_util.tree_map(lambda a: a[take], tree)


@jax.jit
def _scatter_merge(base_tree, new_tree, idx):
    """base[idx[k]] = new[k] for every leaf; out-of-bounds idx rows drop."""
    return jax.tree_util.tree_map(
        lambda base, new: base.at[idx].set(new, mode="drop"), base_tree, new_tree
    )


@jax.jit
def _pack_leaves(tree):
    """Flatten every result leaf into ONE f32 buffer (all integer fields
    are < 2^24, so the f32 round-trip is exact) — a single device->host
    transfer instead of one tunnel round-trip per leaf."""
    return jnp.concatenate(
        [l.astype(jnp.float32).reshape(-1) for l in jax.tree_util.tree_leaves(tree)]
    )


def _unpack_leaves(tree, flat):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out, off = [], 0
    for l in leaves:
        n = int(np.prod(l.shape)) if l.ndim else 1
        out.append(flat[off : off + n].reshape(l.shape).astype(l.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _tree_concat(results):
    """Concatenate per-batch result trees on the HOST with ONE packed
    device->host transfer per batch (per-leaf transfers each paid full
    tunnel latency; the 'gather' phase was ~30% of warm e2e wall before
    the async pipelining, and the packed copy halves what remained)."""
    packed = [_pack_leaves(r) for r in results]
    for pk in packed:
        pk.copy_to_host_async()
    parts = [
        _unpack_leaves(r, np.asarray(pk)) for r, pk in zip(results, packed)
    ]
    if len(parts) == 1:
        return parts[0]
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(list(xs)), *parts
    )


def run_suite(
    robot: str = "panda",
    problem_names=None,
    settings: rrtc.RRTCSettings | None = None,
    simp_settings: simplify.SimplifySettings | None = None,
    max_problems: int | None = None,
    batch_size: int = 700,
    warmup: bool = True,
    planner: str = "auto",
    data: dict | None = None,
    timings: dict | None = None,
) -> SuiteResult:
    """Plan + simplify a whole MBM suite as batched device programs.

    Pass a dict as `timings` to get a wall-clock phase breakdown
    (build/validity/plan/retry/simplify/gather) written into it.

    planner="mega" (default on TPU) runs the per-problem Pallas megakernel
    (planning/rrtc_mega.py): each problem stops the instant it is done, so a
    single batch covers the whole suite and only unsolved problems rerun at a
    32x budget.  planner="xla" keeps the lockstep state machine with straggler
    compaction (r1 driver; also the CPU/test path).
    """
    spec = registry.load(robot)
    if planner == "auto":
        # megakernel on real TPUs; the lockstep XLA driver elsewhere (the
        # megakernel only runs interpreted on CPU, far too slow for a suite)
        planner = "mega" if jax.default_backend() == "tpu" else "xla"
    if planner == "mega":
        if settings is None:
            settings = rrtc.RRTCSettings(
                range=registry.RRT_RANGES.get(robot, 1.0),
                max_iterations=4096,
                # node capacity sized for the 32x straggler retry: the SAME
                # compiled program serves both calls (budget is a runtime
                # scalar; the megakernel only ever touches the live tree
                # prefix, so the larger buffer costs nothing per step)
                max_samples=16384,
                max_path=96,
                # Fetch problems need ~30x the samples of Panda's (median
                # 3819 vs 129); wider grow steps amortize the per-step
                # fixed costs there (A/B: 78 -> 92 problems/s, cost
                # 9.93 -> 9.64 vs reference 9.93).  K * W is capped at 128
                # lanes, so the dd-prefilter window is 8 at K=16 (A/B:
                # 2006 vs 1888-1963 problems/s on Panda) and 4 at K=32.
                samples_per_step=32 if robot == "fetch" else 16,
                connect_segments=8,
                sample_window=4 if robot == "fetch" else 8,
            )
        retry_budget = 32 * settings.max_iterations
    elif settings is None:
        settings = rrtc.RRTCSettings(
            range=registry.RRT_RANGES.get(robot, 1.0),
            max_iterations=4096,
            # node-buffer capacity: small on purpose — the masked brute-force
            # NN and the lockstep state copies scale with it, and the p99 MBM
            # tree is ~200 nodes; the rare problem that fills the buffer is
            # simply rerun by the straggler retry below at a large capacity.
            max_samples=512,
            max_path=96,
            samples_per_step=16,
            connect_segments=8,
            sample_window=4,
        )
    if simp_settings is None:
        simp_settings = simplify.SimplifySettings(pair_chunk=64)
    if planner != "mega":
        # straggler phase: much larger sample budget at high K (fewer lockstep
        # steps; per-step fixed cost dominates at small batch sizes).  The NN
        # prefix bucketing in plan_batch_compact keeps the big node buffer
        # cheap until a tree actually grows into it.
        retry_settings = dataclasses.replace(
            settings,
            max_iterations=32 * 4096,
            max_samples=16384,
            samples_per_step=128,
            connect_segments=16,
            sample_window=4,
        )
    RETRY_B = 16  # fixed straggler batch size so the retry compiles once

    if data is None:
        data = load_problems(robot)
    problems, names = [], []
    for pname, plist in data["problems"].items():
        if problem_names and pname not in problem_names:
            continue
        for p in plist:
            problems.append(p)
            names.append((pname, p["index"]))
    if max_problems:
        problems, names = problems[:max_problems], names[:max_problems]

    n_real = len(problems)
    pad = (-n_real) % batch_size
    problems = problems + [problems[-1]] * pad

    import hashlib

    tmark = time.perf_counter()

    def _phase(name):
        nonlocal tmark
        t = time.perf_counter()
        if timings is not None:
            timings[name] = timings.get(name, 0.0) + (t - tmark)
        tmark = t

    key = hashlib.md5(
        repr((robot, sorted(problem_names or []), max_problems,
              len(problems))).encode()
    ).hexdigest()[:12]
    envs, starts, goals, masks = build_batch(problems, cache_key=key)
    jax.block_until_ready(envs)
    _phase("build_batch")

    # validity of start & at least one goal, collision-only as in the
    # reference dataset (robot_helper.hh:256 check_bounds = false).  One
    # jitted program: start and goal configs checked in a single fused
    # dispatch (eager vmapped dispatches each pay full tunnel latency).
    valid = np.asarray(
        _valid_fused(spec, envs, starts, goals, masks)
    )[:n_real]
    _phase("validity")

    if planner == "mega":
        from vamp_mvt_tpu.planning import rrtc_mega, simplify_mega

        # jit the full per-batch pipelines (the megakernel wrappers do a
        # handful of eager array preps, and every eager dispatch pays full
        # device-call latency), memoized across run_suite calls.  The budget
        # is a runtime argument, so the 32x straggler retry reuses the SAME
        # compiled program on the full batch: non-straggler rows get their
        # goal replaced by their start, pass the direct check, and exit the
        # kernel loop instantly (~µs each).
        def build_mega_fns():
            plan_fn = jax.jit(
                lambda e, s, g, m, budget: rrtc_mega.plan_batch_mega(
                    spec, e, s, g, m, settings, budget=budget
                )
            )
            retry_goals_fn = jax.jit(
                lambda s, g, um: jnp.where(
                    um[:, None, None], g, s[:, None, :]
                )
            )
            merge_fn = jax.jit(
                lambda old, new, um: jax.tree_util.tree_map(
                    lambda o, n: jnp.where(
                        um.reshape(um.shape + (1,) * (o.ndim - 1)), n, o
                    ),
                    old, new,
                )
            )
            if simplify_mega.supports(simp_settings):
                simp_fn = jax.jit(
                    lambda e, p, l: simplify_mega.simplify_batch_mega(
                        spec, e, p, l, simp_settings
                    )
                )
            else:
                simp_fn = lambda e, p, l: simplify.simplify_batch_compact(
                    spec, e, p, l, simp_settings
                )
            return plan_fn, retry_goals_fn, merge_fn, simp_fn

        plan_fn, retry_goals_fn, merge_fn, simp_fn = _cached_fns(
            ("mega", id(spec), settings, simp_settings),
            build_mega_fns,
        )
    else:
        plan_fn = lambda e, s, g, m: rrtc.plan_batch_compact(
            spec, e, s, g, m, settings, segment_steps=64
        )
        # min_batch == RETRY_B so the warmup visits every compiled retry size
        retry_fn = lambda e, s, g, m: rrtc.plan_batch_compact(
            spec, e, s, g, m, retry_settings, segment_steps=64, min_batch=RETRY_B
        )
        simp_fn = lambda e, p, l: simplify.simplify_batch_compact(
            spec, e, p, l, simp_settings
        )

    def batches(arr):
        return [
            jax.tree_util.tree_map(lambda a: a[i : i + batch_size], arr)
            for i in range(0, len(problems), batch_size)
        ]

    env_b = batches(envs)
    st_b, gl_b, mk_b = batches(starts), batches(goals), batches(masks)

    if planner == "mega":

        def solve_batch(e, s_, g, m):
            pr = plan_fn(e, s_, g, m, jnp.int32(settings.max_iterations))
            jax.block_until_ready(pr)
            t_retry = time.perf_counter()
            unsolved = ~np.asarray(pr.solved)
            if unsolved.any():
                # same compiled program, 32x budget; solved rows are padded
                # to trivial start==start problems that exit instantly
                um = jnp.asarray(unsolved)
                g2 = retry_goals_fn(s_, g, um)
                rr = plan_fn(e, s_, g2, m, jnp.int32(retry_budget))
                pr = merge_fn(pr, rr, um)
                jax.block_until_ready(pr)
            return pr, t_retry

    else:

        def solve_batch(e, s_, g, m):
            pr = plan_fn(e, s_, g, m)
            jax.block_until_ready(pr)
            t_retry = time.perf_counter()
            unsolved = ~np.asarray(pr.solved)
            if unsolved.any():
                # rerun stragglers at the 32x budget in fixed-size batches
                # and scatter the results back with ONE jitted device program
                # per batch (eager per-field scatters pay dispatch latency)
                idx = np.flatnonzero(unsolved)
                for off in range(0, len(idx), RETRY_B):
                    part = idx[off : off + RETRY_B]
                    take = jnp.asarray(np.resize(part, RETRY_B))
                    sub = _gather_sub((e, s_, g, m), take)
                    rr = retry_fn(*sub)
                    # padding rows scatter out of bounds and are dropped
                    part_pad = np.full(RETRY_B, len(unsolved), np.int32)
                    part_pad[: len(part)] = part
                    pr = _scatter_merge(pr, rr, jnp.asarray(part_pad))
                jax.block_until_ready(pr)
            return pr, t_retry

    if warmup:
        # Warm every program the run will dispatch (incl. the retry path —
        # for mega it is the same planner program with a different budget
        # scalar plus the two small prep/merge programs).
        e0, s0, g0, m0 = env_b[0], st_b[0], gl_b[0], mk_b[0]
        if planner == "mega":
            r = plan_fn(e0, s0, g0, m0, jnp.int32(settings.max_iterations))
            um0 = jnp.zeros(r.solved.shape[0], bool).at[0].set(True)
            g20 = retry_goals_fn(s0, g0, um0)
            rr0 = plan_fn(e0, s0, g20, m0, jnp.int32(retry_budget))
            jax.block_until_ready(merge_fn(r, rr0, um0))
        else:
            r = plan_fn(e0, s0, g0, m0)
            take0 = jnp.asarray(np.resize(np.arange(1), RETRY_B))
            sub0 = _gather_sub((e0, s0, g0, m0), take0)
            rr0 = retry_fn(*sub0)
            jax.block_until_ready(rr0.solved)
            jax.block_until_ready(_scatter_merge(r, rr0, take0))
        sr = simp_fn(e0, r.path, r.path_length)
        jax.block_until_ready(sr)

    _phase("warmup")
    plan_parts, simp_parts = [], []
    t_plan = t_simp = 0.0
    for e, s_, g, m in zip(env_b, st_b, gl_b, mk_b):
        t0 = time.perf_counter()
        pr, tr0 = solve_batch(e, s_, g, m)
        t1 = time.perf_counter()
        if timings is not None:
            timings["plan"] = timings.get("plan", 0.0) + (tr0 - t0)
            timings["retry"] = timings.get("retry", 0.0) + (t1 - tr0)
        sr = simp_fn(e, pr.path, pr.path_length)
        jax.block_until_ready(sr)
        t2 = time.perf_counter()
        t_plan += t1 - t0
        t_simp += t2 - t1
        plan_parts.append(pr)
        simp_parts.append(sr)

    tmark = time.perf_counter()
    if timings is not None:
        timings["simplify"] = t_simp
    plan_res = jax.tree_util.tree_map(
        lambda x: x[:n_real], _tree_concat(plan_parts)
    )
    simp_res = jax.tree_util.tree_map(
        lambda x: x[:n_real], _tree_concat(simp_parts)
    )
    _phase("gather")
    return SuiteResult(names, plan_res, simp_res, valid, t_plan, t_simp)


def run_suite_pointcloud(
    robot: str = "panda",
    pc_repr: str = "capt",
    filter_type: str = "scdf",
    problem_names=None,
    settings: rrtc.RRTCSettings | None = None,
    simp_settings: simplify.SimplifySettings | None = None,
    max_problems: int | None = None,
    batch_size: int = 100,
    samples_per_object: int = 10000,
    warmup: bool = True,
    data: dict | None = None,
):
    """Pointcloud-mode MBM suite (reference scripts/evaluate_mbm.py:106-136).

    Per problem: sample primitive surfaces -> filter (scdf/centervox) ->
    build the pointcloud environment -> plan + simplify.  On TPU the planner
    runs the Pallas megakernel against the kernel-resident pointcloud
    structure (collision/pc_kernel.py; decisions bit-identical to the MVT
    query), while the requested MVT/CAPT representation is built for its
    build-time metric.  On CPU backends the lockstep XLA path plans directly
    on batched MVT/CAPT structures.  Filter/build run on the host (native
    C++) and their per-problem nanoseconds are reported alongside the
    planning stats like the reference's timing columns
    (resources/README.md:151-183).

    Returns (SuiteResult, dict with filter_ns/build_ns arrays and medians).
    """
    from vamp_mvt_tpu.pointcloud import pipeline

    spec = registry.load(robot)
    if settings is None:
        settings = rrtc.RRTCSettings(
            range=registry.RRT_RANGES.get(robot, 1.0),
            max_iterations=4096,
            max_samples=4096,
            max_path=96,
            samples_per_step=16,
            connect_segments=8,
            sample_window=8,
        )
    retry_budget = 16 * settings.max_iterations
    retry_settings = dataclasses.replace(
        settings,
        max_iterations=retry_budget,
    )
    RETRY_B = 8
    if simp_settings is None:
        simp_settings = simplify.SimplifySettings(pair_chunk=64)

    if data is None:
        data = load_problems(robot)
    problems, names = [], []
    for pname, plist in data["problems"].items():
        if problem_names and pname not in problem_names:
            continue
        for p in plist:
            problems.append(p)
            names.append((pname, p["index"]))
    if max_problems:
        problems, names = problems[:max_problems], names[:max_problems]
    n_real = len(problems)
    pad = (-n_real) % batch_size
    problems = problems + [problems[-1]] * pad

    use_mega = jax.default_backend() == "tpu"

    # pass 1: sample + filter + build (timed per problem, like the reference).
    # The requested representation (MVT/CAPT) is built for its build-time
    # metric; planning itself uses the kernel-resident structure (pck) on
    # TPU — query decisions are identical (both are exact sphere-vs-points).
    pcks, envs_list, filter_ns, build_ns = [], [], [], []
    for p in problems:
        b, _orig, filt, f_ns, b_ns = pipeline.problem_to_pointcloud_env(
            robot, p, pc_repr=pc_repr, samples_per_object=samples_per_object,
            filter_type=filter_type, kernel_pc=use_mega,
        )
        filter_ns.append(f_ns)
        build_ns.append(b_ns)
        if use_mega:
            pcks.append(b.pck)
        else:
            envs_list.append(b)

    if use_mega:
        # pad chunk arrays to the batch maximum (meta keeps the live count)
        from vamp_mvt_tpu.collision.pc_kernel import CS, SS, PCKernelData

        nch = max(pk.chunks.shape[0] for pk in pcks)
        nsc = max(pk.supers.shape[0] for pk in pcks)
        FAR = np.float32(1e8)

        def padpk(pk):
            n = pk.chunks.shape[0]
            m = pk.supers.shape[0]
            if n == nch and m == nsc:
                return pk
            ch = np.full((nch, 8), 0.0, np.float32)
            ch[:n] = np.asarray(pk.chunks)
            ch[n:, :3] = FAR
            pt = np.full((nch, 3 * CS), FAR, np.float32)
            pt[:n] = np.asarray(pk.points)
            su = np.full((nsc, 8), 0.0, np.float32)
            su[:m] = np.asarray(pk.supers)
            su[m:, :3] = FAR
            return PCKernelData(
                bitmap=pk.bitmap, chunks=ch, points=pt, supers=su,
                meta=pk.meta, radii=pk.radii,
            )

        base = envmod.EnvironmentBuilder().build()
        envs_list = [
            envmod.Environment(
                **{**base._asdict(), "pck": padpk(pk)}
            )
            for pk in pcks
        ]
        envs = envmod.stack_environments(envs_list)
    else:
        # XLA fallback path (CPU/tests): batch the full MVT/CAPT structures
        if pc_repr == "mvt":
            nv = max(b.mvt.voxel_points.shape[0] for b in envs_list)
            cc = max(b.mvt.voxel_points.shape[1] for b in envs_list)
            pads = {"pad_voxels": nv, "pad_capacity": cc}
        else:
            nl = max(b.capt.leaf_aabb.shape[0] for b in envs_list)
            cc = max(b.capt.aff_points.shape[1] for b in envs_list)
            pads = {"pad_leaves": nl, "pad_capacity": cc}
        rebuilt = []
        for p in problems:
            b2, _, _, _, _ = pipeline.problem_to_pointcloud_env(
                robot, p, pc_repr=pc_repr,
                samples_per_object=samples_per_object,
                filter_type=filter_type, pad=pads, kernel_pc=False,
            )
            rebuilt.append(b2.build())
        envs = envmod.stack_environments(rebuilt)

    G = max(len(p["goals"]) for p in problems)
    d = len(problems[0]["start"])
    starts = np.zeros((len(problems), d), np.float32)
    goals = np.zeros((len(problems), G, d), np.float32)
    masks = np.zeros((len(problems), G), bool)
    for i, p in enumerate(problems):
        starts[i] = p["start"]
        for g, goal in enumerate(p["goals"]):
            goals[i, g] = goal
            masks[i, g] = True
    starts, goals, masks = jnp.asarray(starts), jnp.asarray(goals), jnp.asarray(masks)

    valid = np.asarray(_valid_fused(spec, envs, starts, goals, masks))[:n_real]

    if use_mega:
        from vamp_mvt_tpu.planning import rrtc_mega, simplify_mega

        def build_pc_fns():
            return (
                jax.jit(
                    lambda e, s, g, m, budget: rrtc_mega.plan_batch_mega(
                        spec, e, s, g, m, settings, budget=budget
                    )
                ),
                jax.jit(
                    lambda s, g, um: jnp.where(
                        um[:, None, None], g, s[:, None, :]
                    )
                ),
                jax.jit(
                    lambda old, new, um: jax.tree_util.tree_map(
                        lambda o, n: jnp.where(
                            um.reshape(um.shape + (1,) * (o.ndim - 1)), n, o
                        ),
                        old, new,
                    )
                ),
                jax.jit(
                    lambda e, p, l: simplify_mega.simplify_batch_mega(
                        spec, e, p, l, simp_settings
                    )
                ),
            )

        plan_fn, retry_goals_fn, merge_fn, simp_fn = _cached_fns(
            ("mega", id(spec), settings, simp_settings),
            build_pc_fns,
        )
    else:
        plan_fn = lambda e, s, g, m: rrtc.plan_batch_compact(
            spec, e, s, g, m, settings, segment_steps=64
        )
        retry_fn = lambda e, s, g, m: rrtc.plan_batch_compact(
            spec, e, s, g, m, retry_settings, segment_steps=64, min_batch=RETRY_B
        )
        simp_fn = lambda e, p, l: simplify.simplify_batch_compact(
            spec, e, p, l, simp_settings
        )

    def batches(arr):
        return [
            jax.tree_util.tree_map(lambda a: a[i : i + batch_size], arr)
            for i in range(0, len(problems), batch_size)
        ]

    env_b = batches(envs)
    st_b, gl_b, mk_b = batches(starts), batches(goals), batches(masks)

    if use_mega:

        def solve_batch(e, s_, g, m):
            pr = plan_fn(e, s_, g, m, jnp.int32(settings.max_iterations))
            jax.block_until_ready(pr)
            unsolved = ~np.asarray(pr.solved)
            if unsolved.any():
                um = jnp.asarray(unsolved)
                g2 = retry_goals_fn(s_, g, um)
                rr = plan_fn(e, s_, g2, m, jnp.int32(retry_budget))
                pr = merge_fn(pr, rr, um)
                jax.block_until_ready(pr)
            return pr

    else:

        def solve_batch(e, s_, g, m):
            pr = plan_fn(e, s_, g, m)
            jax.block_until_ready(pr)
            unsolved = ~np.asarray(pr.solved)
            if unsolved.any():
                idx = np.flatnonzero(unsolved)
                for off in range(0, len(idx), RETRY_B):
                    part = idx[off : off + RETRY_B]
                    take = jnp.asarray(np.resize(part, RETRY_B))
                    sub = _gather_sub((e, s_, g, m), take)
                    rr = retry_fn(*sub)
                    part_pad = np.full(RETRY_B, len(unsolved), np.int32)
                    part_pad[: len(part)] = part
                    pr = _scatter_merge(pr, rr, jnp.asarray(part_pad))
                jax.block_until_ready(pr)
            return pr

    if warmup:
        e0, s0, g0, m0 = env_b[0], st_b[0], gl_b[0], mk_b[0]
        if use_mega:
            r = plan_fn(e0, s0, g0, m0, jnp.int32(settings.max_iterations))
            um0 = jnp.zeros(r.solved.shape[0], bool).at[0].set(True)
            g20 = retry_goals_fn(s0, g0, um0)
            rr0 = plan_fn(e0, s0, g20, m0, jnp.int32(retry_budget))
            jax.block_until_ready(merge_fn(r, rr0, um0))
        else:
            r = plan_fn(e0, s0, g0, m0)
            take0 = jnp.asarray(np.resize(np.arange(1), RETRY_B))
            sub0 = _gather_sub((e0, s0, g0, m0), take0)
            rr0 = retry_fn(*sub0)
            jax.block_until_ready(rr0.solved)
            jax.block_until_ready(_scatter_merge(r, rr0, take0))
        sr = simp_fn(e0, r.path, r.path_length)
        jax.block_until_ready(sr)

    plan_parts, simp_parts = [], []
    t_plan = t_simp = 0.0
    for e, s_, g, m in zip(env_b, st_b, gl_b, mk_b):
        t0 = time.perf_counter()
        pr = solve_batch(e, s_, g, m)
        t1 = time.perf_counter()
        sr = simp_fn(e, pr.path, pr.path_length)
        jax.block_until_ready(sr)
        t2 = time.perf_counter()
        t_plan += t1 - t0
        t_simp += t2 - t1
        plan_parts.append(pr)
        simp_parts.append(sr)

    plan_res = jax.tree_util.tree_map(lambda x: x[:n_real], _tree_concat(plan_parts))
    simp_res = jax.tree_util.tree_map(lambda x: x[:n_real], _tree_concat(simp_parts))
    suite = SuiteResult(names, plan_res, simp_res, valid, t_plan, t_simp)
    f_ns = np.asarray(filter_ns[:n_real], np.float64)
    b_ns = np.asarray(build_ns[:n_real], np.float64)
    timings = {
        "filter_ns": f_ns,
        "build_ns": b_ns,
        "filter_median_ms": float(np.median(f_ns)) / 1e6,
        "build_median_ms": float(np.median(b_ns)) / 1e6,
        "pc_repr": pc_repr,
        "filter_type": filter_type,
    }
    return suite, timings
