"""Benchmark: MBM Panda standard suite (700 problems), plan + simplify.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference solves+simplifies the 700-problem Panda suite in
210.9 ms wall including Python overhead on one 7950X core
(reference resources/README.md:147-148) = 3319 problems/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_PROBLEMS_PER_SEC = 700 / 0.2109


def main():
    from vamp_mvt_tpu.bench import mbm

    t0 = time.time()
    res = mbm.run_suite(
        "panda",
        problem_names=list(mbm.STANDARD_SCENARIOS),
        batch_size=700,
    )
    summary = res.summary()
    value = summary["problems_per_sec"]

    # end-to-end wall (apples-to-apples with the reference's 210.9 ms, which
    # includes its Python overhead): problem parse (cached pickle) + env
    # build + validity + plan + simplify, compiled code warm from the run
    # above
    t1 = time.time()
    phases = {}
    res2 = mbm.run_suite(
        "panda",
        problem_names=list(mbm.STANDARD_SCENARIOS),
        batch_size=700,
        warmup=False,
        timings=phases,
    )
    e2e_wall = time.time() - t1
    summary["e2e_wall_s"] = round(e2e_wall, 3)
    summary["e2e_problems_per_sec"] = round(700 / e2e_wall, 2)
    summary["e2e_phases"] = {k: round(v, 3) for k, v in phases.items()}

    print(
        json.dumps(
            {
                "metric": "mbm_panda_problems_per_sec",
                "value": round(value, 2),
                "unit": "problems/s",
                "vs_baseline": round(value / BASELINE_PROBLEMS_PER_SEC, 4),
            }
        )
    )
    print(
        json.dumps({"detail": summary, "total_wall_s": round(time.time() - t0, 2)}),
        file=sys.stderr,
    )
    print(res.percentile_table(), file=sys.stderr)


if __name__ == "__main__":
    main()
