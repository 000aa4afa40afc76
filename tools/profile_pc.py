"""Pointcloud-kernel microbench: per-tile cost of the pck path vs primitives.

Builds a real MBM problem's pointcloud env, generates planner-like tiles
(edges of interpolated configs), and times the fused kernel.  Usage:

  python tools/profile_pc.py [problem_name] [index] [n_blocks]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp
from vamp_mvt_tpu.pointcloud import pipeline
from vamp_mvt_tpu.robots import registry


def edge_tiles(spec, n_configs, seed=0, range_=1.0):
    """Planner-like configuration blocks: P=64-point interpolations of random
    short edges (matching the megakernel's spatially coherent tiles)."""
    rng = np.random.default_rng(seed)
    P = 64
    n_edges = n_configs // P
    lo = np.asarray(spec.limits_low)
    hi = np.asarray(spec.limits_high)
    a = rng.uniform(lo, hi, (n_edges, spec.dimension))
    v = rng.normal(0, 1, (n_edges, spec.dimension))
    v *= (range_ * rng.uniform(0.3, 1.0, (n_edges, 1))
          / np.linalg.norm(v, axis=1, keepdims=True))
    t = (np.arange(P) + 1.0) / P
    q = a[:, None] + v[:, None] * t[None, :, None]
    q = np.clip(q, lo, hi)
    return q.reshape(-1, spec.dimension).astype(np.float32)


def bench(f, envs, qd, reps=20):
    # distinct input buffers per rep: identical dispatches can be served
    # from result caches along the way, timing nothing
    qs = [qd + jnp.float32(i) * 1e-7 for i in range(reps)]
    jax.block_until_ready(qs)
    out = f(envs, qd)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(envs, q) for q in qs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps, np.asarray(out)


def main():
    pname = sys.argv[1] if len(sys.argv) > 1 else "bookshelf_small"
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    robot = os.environ.get("PC_ROBOT", "panda")

    spec = registry.load(robot)
    data = mbm.load_problems(robot)
    problem = data["problems"][pname][idx]

    b, orig, filt, f_ns, b_ns = pipeline.problem_to_pointcloud_env(
        robot, problem, pc_repr="mvt", samples_per_object=10000,
        filter_type="scdf", kernel_pc=True,
    )
    env_pc = b.build()
    pk = env_pc.pck
    print(f"{pname}[{idx}]: {len(filt)} pts  chunks {pk.chunks.shape[0]} "
          f"supers {pk.supers.shape[0]} bitmap {pk.bitmap.shape} "
          f"W={int(pk.meta[0,4])}")

    # primitive env for the same problem (the baseline the pc path chases)
    env_prim = mbm.problem_to_builder(problem).build()

    N = n_blocks * 1024
    q = edge_tiles(spec, N, range_=1.0)
    qd = jnp.asarray(q.T.reshape(1, spec.dimension, N))

    runner = jax.jit(lambda e, x: fp.fkcc_pallas_batched_lanes(spec, e, x)[0])
    env_pc1 = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], env_pc)
    env_pr1 = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], env_prim)

    dt_pc, out_pc = bench(runner, env_pc1, qd)
    dt_pr, out_pr = bench(runner, env_pr1, qd)
    blocks = N // 1024
    print(f"pointcloud : {dt_pc*1e3:8.2f} ms  {dt_pc/blocks*1e6:8.1f} us/block  "
          f"valid {out_pc.sum()}/{N}")
    print(f"primitives : {dt_pr*1e3:8.2f} ms  {dt_pr/blocks*1e6:8.1f} us/block  "
          f"valid {out_pr.sum()}/{N}")
    print(f"ratio      : {dt_pc/dt_pr:8.1f}x")

    # per-phase decomposition (profiling-only pc_phase knob; phase != 2
    # results are intentionally wrong — only the timing matters here)
    for phase, label in ((0, "bitmap gate only"),
                         (5, "scan, synthesized points")):
        r = jax.jit(
            lambda e, x, p=phase: fp.fkcc_pallas_batched_lanes(
                spec, e, x, pc_phase=p
            )[0]
        )
        dt, _ = bench(r, env_pc1, qd)
        print(f"phase {phase} ({label:<28}): {dt*1e3:8.2f} ms  "
              f"{dt/blocks*1e6:8.1f} us/block")

    # exactness vs brute force on a subsample
    sub = np.random.default_rng(1).choice(N, 2048, replace=False)
    from vamp_mvt_tpu.ops.fk import sphere_positions

    centers = np.asarray(sphere_positions(spec, jnp.asarray(q[sub])))
    pts = np.asarray(filt, np.float32)
    rr = np.asarray(spec.sphere_radius)
    thr2 = (rr[None, :, None] + pipeline.POINT_RADIUS) ** 2
    hits = []
    for off in range(0, len(sub), 64):
        c = centers[off : off + 64]
        d2 = ((c[:, :, None, :] - pts[None, None]) ** 2).sum(-1)
        hits.append((d2 <= thr2).any((1, 2)))
    hit = np.concatenate(hits)
    # kernel validity also includes self-collision: expected = self-valid AND
    # no point hit; get self-only validity from the kernel on an empty env
    from vamp_mvt_tpu.collision.environment import EnvironmentBuilder

    env_empty1 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a)[None], EnvironmentBuilder().build()
    )
    qd_sub = jnp.asarray(q[sub].T[None])
    self_ok = np.asarray(runner(env_empty1, qd_sub)).astype(bool)
    expected = self_ok & ~hit
    agree = (np.asarray(out_pc)[sub].astype(bool) == expected).mean()
    print(f"exactness vs brute force (2048 sub): {agree*100:.2f}% agree")


if __name__ == "__main__":
    main()
