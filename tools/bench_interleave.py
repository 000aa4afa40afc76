"""A/B the megakernel connect-cadence interleave on the real MBM suite.

Runs the standard Panda suite twice through run_suite with identical settings
except `interleave`, and reports problems/s + quality deltas — the measurement
behind PARITY roadmap #2 (alternating grow/connect steps pay the per-step
fixed costs twice; interleave runs the grow part every step with an active
connect chain riding along in the same kernel step).

Usage: python tools/bench_interleave.py [robot] [batch_size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import dataclasses

import numpy as np

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.planning import rrtc
from vamp_mvt_tpu.robots import registry


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "panda"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 700

    base = rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get(robot, 1.0),
        max_iterations=4096,
        max_samples=2048,
        max_path=96,
        samples_per_step=16,
        connect_segments=8,
        sample_window=4,
    )
    data = mbm.load_problems(robot)
    rows = []
    for inter in (False, True):
        s = dataclasses.replace(base, interleave=inter)
        res = mbm.run_suite(
            robot,
            problem_names=list(mbm.STANDARD_SCENARIOS),
            settings=s,
            batch_size=batch,
            data=data,
        )
        summ = res.summary()
        rows.append((inter, summ))
        print(
            f"interleave={inter}: {summ['problems_per_sec']:8.1f} problems/s  "
            f"solved {summ['solved_problems']}/{summ['valid_problems']}  "
            f"median cost {summ['median_simplified_cost']:.3f}  "
            f"median samples {summ['median_iterations']:.0f}  "
            f"plan {summ['plan_wall_s']:.3f}s simp {summ['simplify_wall_s']:.3f}s"
        )
    a, b = rows[0][1], rows[1][1]
    print(
        f"speedup: {b['problems_per_sec'] / a['problems_per_sec']:.3f}x  "
        f"cost delta: {b['median_simplified_cost'] - a['median_simplified_cost']:+.4f}"
    )


if __name__ == "__main__":
    main()
