"""Pointcloud-mode MBM suite benchmark (the reference's CAPT table counterpart).

Runs run_suite_pointcloud on the standard suite: per problem, sample primitive
surfaces -> SCDF filter -> build MVT/CAPT (build-time metric) + the
kernel-resident pck structure -> plan + simplify megakernels.  Reference
numbers to beat: CAPT suite plan median 111 us, filter 2.30 ms, build 2.13 ms,
699/699 (reference resources/README.md:151-183).

Usage: python tools/bench_pc_suite.py [robot] [pc_repr] [max_problems]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "panda"
    pc_repr = sys.argv[2] if len(sys.argv) > 2 else "capt"
    max_problems = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from vamp_mvt_tpu.bench import mbm

    t0 = time.time()
    suite, timings = mbm.run_suite_pointcloud(
        robot,
        pc_repr=pc_repr,
        problem_names=list(mbm.STANDARD_SCENARIOS),
        max_problems=max_problems,
        batch_size=100,
    )
    total = time.time() - t0
    summ = suite.summary()
    out = {
        "robot": robot,
        "pc_repr": pc_repr,
        "problems_per_sec": round(summ["problems_per_sec"], 2),
        "solved": summ["solved_problems"],
        "valid": summ["valid_problems"],
        "total": summ["total_problems"],
        "median_initial_cost": round(summ["median_initial_cost"], 4),
        "median_simplified_cost": round(summ["median_simplified_cost"], 4),
        "plan_wall_s": round(summ["plan_wall_s"], 3),
        "simplify_wall_s": round(summ["simplify_wall_s"], 3),
        "filter_median_ms": round(timings["filter_median_ms"], 3),
        "build_median_ms": round(timings["build_median_ms"], 3),
        "total_wall_s": round(total, 2),
    }
    print(json.dumps(out))
    print(suite.percentile_table(), file=sys.stderr)


if __name__ == "__main__":
    main()
