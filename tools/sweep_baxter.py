"""Baxter solve-rate budget sweep (round-3 verdict ask #5).

The 1800-problem Baxter bookshelf_tall_both_arms suite (14 DoF, resolution 64)
solved 991/1470 valid at a 131k-sample budget in round 2.  This sweep planning
the UNSOLVED valid problems at escalating budgets and ranges answers whether
the remainder is budget-bound (solve rate keeps climbing) or systematic
(plateau).  The reference ships this dataset with no published numbers
(resources/README.md:25).

Usage: python tools/sweep_baxter.py [max_problems]
Writes a markdown table to stdout; run on the TPU.
"""

import dataclasses
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
from vamp_mvt_tpu.planning import rrtc, rrtc_mega
from vamp_mvt_tpu.robots import registry


def main():
    maxp = int(sys.argv[1]) if len(sys.argv) > 1 else None
    spec = registry.load("baxter")
    data = mbm.load_problems("baxter")
    problems = []
    for plist in data["problems"].values():
        problems.extend(plist)
    if maxp:
        problems = problems[:maxp]
    n = len(problems)
    print(f"{n} problems")

    envs, starts, goals, masks = mbm.build_batch(
        problems, cache_key=f"baxter_sweep_{n}"
    )
    valid = np.asarray(mbm._valid_fused(spec, envs, starts, goals, masks))
    print(f"valid {valid.sum()}/{n}")

    base = rrtc.RRTCSettings(
        range=registry.RRT_RANGES["baxter"],
        max_iterations=4096,
        max_samples=2048,
        max_path=96,
        samples_per_step=16,
        connect_segments=8,
        sample_window=4,
    )

    # stage 0: everyone at the round-2-equivalent budget
    plan0 = jax.jit(
        lambda e, s, g, m: rrtc_mega.plan_batch_mega(spec, e, s, g, m, base)
    )
    t0 = time.perf_counter()
    r = plan0(envs, starts, goals, masks)
    solved = np.asarray(r.solved) & valid
    print(f"stage0 (4k iters): solved {solved.sum()}/{valid.sum()} "
          f"({time.perf_counter()-t0:.1f}s)")

    remaining = valid & ~np.asarray(r.solved)
    rows = [("4k", 0.5, int(solved.sum()), valid.sum())]

    # escalating budgets x ranges on the remaining problems
    for iters, msamp, rng_ in ((131_072, 16384, 0.5), (131_072, 16384, 1.0),
                               (1_048_576, 16384, 0.5), (1_048_576, 16384, 1.0)):
        idx = np.flatnonzero(remaining)
        if not len(idx):
            break
        st = dataclasses.replace(
            base, max_iterations=iters, max_samples=msamp, range=rng_
        )
        B = 64
        pad = (-len(idx)) % B
        idxp = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        planR = jax.jit(
            lambda e, s, g, m: rrtc_mega.plan_batch_mega(spec, e, s, g, m, st)
        )
        newly = np.zeros(n, bool)
        t0 = time.perf_counter()
        for off in range(0, len(idxp), B):
            part = idxp[off : off + B]
            take = jnp.asarray(part)
            sub = mbm._gather_sub((envs, starts, goals, masks), take)
            rr = planR(*sub)
            newly[part] |= np.asarray(rr.solved)
        dt = time.perf_counter() - t0
        newly &= remaining
        remaining &= ~newly
        total_solved = int((valid & ~remaining).sum())
        rows.append((f"{iters//1024}k r={rng_}", rng_, total_solved, valid.sum()))
        print(f"budget {iters} range {rng_}: +{newly.sum()} newly solved, "
              f"cumulative {total_solved}/{valid.sum()} ({dt:.1f}s)")

    print("\n| budget/range | cumulative solved | rate |")
    print("|---|---|---|")
    for tag, _, sv, vd in rows:
        print(f"| {tag} | {sv}/{vd} | {sv/vd*100:.1f}% |")


if __name__ == "__main__":
    main()
