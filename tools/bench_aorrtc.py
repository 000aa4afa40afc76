"""AORRTC anytime table: cost vs samples on MBM cage problems (device batch).

Runs aorrtc.solve_batch with history=True at reference-default budgets
(aorrtc_settings.hh:8-23: 32k anytime samples, 4k internal searches) and
prints the per-round median cost against the straight-line lower bound —
the anytime-convergence counterpart of the reference's single-problem host
loop (aorrtc.hh:431-487).

Usage: python tools/bench_aorrtc.py [n_problems] [scenario]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import dataclasses

import numpy as np
import jax.numpy as jnp

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.planning import aorrtc, rrtc, simplify
from vamp_mvt_tpu.robots import registry


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    scenario = sys.argv[2] if len(sys.argv) > 2 else "cage"

    spec = registry.load("panda")
    data = mbm.load_problems("panda")
    problems = data["problems"][scenario][:n]
    envs, starts, goals, masks = mbm.build_batch(
        problems, cache_key=f"aorrtc_{scenario}_{n}"
    )
    valid = np.asarray(mbm._valid_fused(spec, envs, starts, goals, masks))

    s = aorrtc.AORRTCSettings(
        rrtc=rrtc.RRTCSettings(
            range=registry.RRT_RANGES["panda"],
            max_iterations=4096,
            max_samples=2048,
            max_path=96,
            samples_per_step=16,
            connect_segments=8,
            sample_window=4,
        ),
        simplify=simplify.SimplifySettings(pair_chunk=64),
        max_iterations=32768,
        max_internal_iterations=4096,
    )
    t0 = time.perf_counter()
    res, samples, hist = aorrtc.solve_batch(
        spec, envs, starts, goals, masks, s, history=True
    )
    dt = time.perf_counter() - t0

    solved = np.asarray(res.cost) < 1e29
    ok = solved & valid
    # straight-line lower bound per problem
    g0 = np.asarray(goals)[:, 0]
    bound = np.linalg.norm(np.asarray(starts) - g0, axis=1)
    # no valid path can beat the straight line: a solved cost below it is a
    # planner bug (caught one in round 5: f32 overflow of the 1e30 unsolved
    # sentinel in the augmented metric made AOX join back into the start
    # tree and report loop paths as solved)
    below = ok & (np.asarray(res.cost) < bound - 1e-4)
    assert not below.any(), (
        f"solved costs below the straight-line bound: {np.flatnonzero(below)}"
    )

    print(f"{n} {scenario} problems ({valid.sum()} valid, {ok.sum()} solved) "
          f"in {dt:.1f}s wall")
    print("| round | median cost | median cost/bound |")
    print("|---|---|---|")
    for rd in range(hist.shape[0]):
        c = hist[rd][ok]
        fin = c < 1e29
        if not fin.any():
            continue
        ratio = np.median(c[fin] / bound[ok][fin])
        print(f"| {rd} | {np.median(c[fin]):.3f} | {ratio:.4f} |")
    final = np.asarray(res.cost)[ok]
    print(f"final: median {np.median(final):.3f}  mean excess over bound "
          f"{np.mean(final / bound[ok] - 1) * 100:.2f}%  "
          f"median samples {np.median(np.asarray(samples)[ok]):.0f}")


if __name__ == "__main__":
    main()
