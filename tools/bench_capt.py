"""Pointcloud query-rate microbench: CAPT vs MVT vs kernel pck structure.

Counterpart of the reference's <10 ns/query claim (README.md:24, the disabled
in-tree benchmark capt.hh:626-817): measures queries/s of each device query
path on real filtered MBM clouds, with planner-realistic query batches
(sphere positions of interpolated configuration edges).

Usage: python tools/bench_capt.py [problem] [index] [n_queries]
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
from vamp_mvt_tpu.collision import capt as capt_mod
from vamp_mvt_tpu.collision import mvt as mvt_mod
from vamp_mvt_tpu.ops.fk import sphere_positions
from vamp_mvt_tpu.pointcloud import pipeline
from vamp_mvt_tpu.robots import registry


def bench(f, *args, reps=10):
    # vary the final (query) argument per rep: identical dispatches can be
    # served from result caches along the way, timing nothing
    varied = [args[:-1] + (args[-1] + i * 1e-7,) for i in range(reps)]
    jax.block_until_ready([v[-1] for v in varied])
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*v) for v in varied]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps, np.asarray(out)


def main():
    pname = sys.argv[1] if len(sys.argv) > 1 else "bookshelf_small"
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    NQ = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20
    robot = os.environ.get("PC_ROBOT", "panda")

    spec = registry.load(robot)
    data = mbm.load_problems(robot)
    problem = data["problems"][pname][idx]

    # filtered cloud + all three structures for the same points
    b, _orig, filt, _f, _bns = pipeline.problem_to_pointcloud_env(
        robot, problem, pc_repr="mvt", samples_per_object=10000,
        filter_type="scdf", kernel_pc=True,
    )
    pts = np.asarray(filt, np.float32)
    print(f"{pname}[{idx}]: {len(pts)} filtered points")
    r_min = float(spec.min_radius)
    r_max = float(spec.max_radius)
    rp = pipeline.POINT_RADIUS
    capt = capt_mod.build_capt(pts, r_min, r_max, rp)
    mvt = b.mvt

    # planner-realistic queries: robot sphere positions along random edges
    rng = np.random.default_rng(0)
    P = 64
    n_edges = max(NQ // (P * spec.n_spheres), 1)
    lo = np.asarray(spec.limits_low)
    hi = np.asarray(spec.limits_high)
    a = rng.uniform(lo, hi, (n_edges, spec.dimension))
    v = rng.normal(0, 1, (n_edges, spec.dimension))
    v *= rng.uniform(0.3, 1.0, (n_edges, 1)) / np.linalg.norm(
        v, axis=1, keepdims=True
    )
    t = (np.arange(P) + 1.0) / P
    q = (a[:, None] + v[:, None] * t[None, :, None]).reshape(-1, spec.dimension)
    centers = np.asarray(
        sphere_positions(spec, jnp.asarray(q, jnp.float32))
    ).reshape(-1, 3)
    radii = np.tile(np.asarray(spec.sphere_radius, np.float32), len(q))
    N = len(centers)
    print(f"{N} queries ({n_edges} edges x {P} points x {spec.n_spheres} spheres)")

    cj = jnp.asarray(centers)
    rj = jnp.asarray(radii)

    f_capt = jax.jit(lambda p, r: capt_mod.capt_collides(capt, p, r))
    f_mvt = jax.jit(lambda p, r: mvt_mod.mvt_collides(mvt, p, r))
    dt_c, out_c = bench(f_capt, cj, rj)
    dt_m, out_m = bench(f_mvt, cj, rj)
    # both queries are exact (CAPT after the top-AABB r_point fix; MVT uses
    # r + r_point throughout) — any disagreement is a regression
    dis = int((out_c != out_m).sum())
    assert dis == 0, f"CAPT and MVT disagree on {dis}/{N} queries"

    rows = [("CAPT gather-descent", dt_c, out_c.sum()),
            ("MVT 27-voxel gather", dt_m, out_m.sum())]
    for name, dt, hits in rows:
        print(f"{name:<22} {dt*1e3:9.2f} ms  {N/dt/1e6:8.1f} Mq/s  "
              f"{dt/N*1e9:7.2f} ns/q  hits {hits}")

    # the kernel pck path for the same queries: fkcc on a sphere robot whose
    # single sphere sweeps each (center, radius) — measures the fused kernel's
    # pointcloud phase in the same units
    from vamp_mvt_tpu.collision import environment as envmod
    from vamp_mvt_tpu.collision.pc_kernel import radius_classes
    from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp

    r_uniq = np.unique(radii)
    if len(r_uniq) <= 12 and jax.default_backend() == "tpu":
        wmin = pts.min(0) - 0.5
        wmax = pts.max(0) + 0.5
        ww = float(max(wmax - wmin))
        wmax = wmin + ww
        sspec = registry.sphere_spec(lows=wmin, highs=wmax, radius=float(r_uniq[0]))
        eb = envmod.EnvironmentBuilder()
        eb.add_kernel_pointcloud(
            pts, radius_classes(np.asarray([r_uniq[0]])), wmin, wmax, rp,
            float(r_uniq[0]),
        )
        env1 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[None], eb.build()
        )
        sub = centers[radii == r_uniq[0]]
        qd = jnp.asarray(sub.T[None])
        f_pck = jax.jit(lambda e, x: fp.fkcc_pallas_batched_lanes(sspec, e, x))
        dt_k, out_k = bench(f_pck, env1, qd)
        nk = len(sub)
        print(f"{'pck fused kernel':<22} {dt_k*1e3:9.2f} ms  "
              f"{nk/dt_k/1e6:8.1f} Mq/s  {dt_k/nk*1e9:7.2f} ns/q  "
              f"(radius {r_uniq[0]:.4f}, {nk} queries)")


if __name__ == "__main__":
    main()
