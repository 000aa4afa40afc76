"""Measure plan_batch_mega on the MBM Panda suite vs the r1 compact driver.

Usage: python tools/bench_mega.py [--max 700] [--iters 4096] [--m 2048]
"""
import argparse
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
from vamp_mvt_tpu.ops import fkcc
from vamp_mvt_tpu.planning import rrtc, rrtc_mega
from vamp_mvt_tpu.robots import registry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--max", type=int, default=700)
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--c", type=int, default=8)
    ap.add_argument("--w", type=int, default=4)
    ap.add_argument("--retry-iters", type=int, default=131072)
    ap.add_argument("--retry-m", type=int, default=16384)
    args = ap.parse_args()

    spec = registry.load(args.robot)
    data = mbm.load_problems(args.robot)
    problems = []
    for pname, plist in data["problems"].items():
        if args.robot == "panda" and pname not in mbm.STANDARD_SCENARIOS:
            continue
        problems.extend(plist)
    problems = problems[: args.max]
    B = len(problems)
    envs, starts, goals, masks = mbm.build_batch(problems)

    valid_start = mbm.validate_configs(spec, envs, starts)
    valid_goal = jax.jit(
        jax.vmap(
            lambda e, g, m: jnp.any(
                jax.vmap(lambda q: fkcc.fkcc(spec, e, q[None])[0])(g) & m
            )
        )
    )(envs, goals, masks)
    valid = np.asarray(valid_start & valid_goal)

    settings = rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get(args.robot, 1.0),
        max_iterations=args.iters,
        max_samples=args.m,
        max_path=96,
        samples_per_step=args.k,
        connect_segments=args.c,
        sample_window=args.w,
    )
    retry_settings = dataclasses.replace(
        settings, max_iterations=args.retry_iters, max_samples=args.retry_m
    )

    plan_fn = lambda s: rrtc_mega.plan_batch_mega(
        spec, envs, starts, goals, masks, s
    )

    # warmup/compile
    t0 = time.perf_counter()
    r = plan_fn(settings)
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    print(f"compile+first run: {t1-t0:.2f}s")

    t0 = time.perf_counter()
    r = plan_fn(settings)
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    solved = np.asarray(r.solved)
    print(
        f"main pass: {t1-t0:.3f}s  {B/(t1-t0):.1f} problems/s  "
        f"solved {int(solved[valid].sum())}/{int(valid.sum())} valid"
    )

    unsolved = valid & ~solved
    if unsolved.any():
        idx = np.flatnonzero(unsolved)
        print(f"retrying {len(idx)} stragglers at {args.retry_iters} iters, M={args.retry_m}")
        RB = 8
        take = np.resize(idx, max(RB, 1 << int(np.ceil(np.log2(len(idx))))))
        e2, s2, g2, m2 = jax.tree_util.tree_map(
            lambda a: a[take], (envs, starts, goals, masks)
        )
        t0 = time.perf_counter()
        rr = rrtc_mega.plan_batch_mega(spec, e2, s2, g2, m2, retry_settings)
        jax.block_until_ready(rr)
        t1 = time.perf_counter()
        rr = rrtc_mega.plan_batch_mega(spec, e2, s2, g2, m2, retry_settings)
        jax.block_until_ready(rr)
        t2 = time.perf_counter()
        rsolved = np.asarray(rr.solved)[: len(idx)]
        print(
            f"retry: {t1-t0:.3f}s (incl compile), {t2-t1:.3f}s warm  "
            f"solved {int(rsolved.sum())}/{len(idx)}"
        )
        solved = solved.copy()
        solved[idx] = rsolved

    costs = np.asarray(r.cost)
    print(
        f"TOTAL solved {int(solved[valid].sum())}/{int(valid.sum())} valid; "
        f"median initial cost {np.median(costs[solved & valid]):.3f}; "
        f"median iters {np.median(np.asarray(r.iterations)[solved & valid]):.0f}"
    )


if __name__ == "__main__":
    main()
