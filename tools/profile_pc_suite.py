"""Pointcloud-phase decomposition of the REAL planner megakernel.

Runs run_suite_pointcloud on a suite subset once per pc_phase value
(profiling-only knob; phases != 2 give wrong validity, so solve rates and
costs are meaningless there — only plan_wall matters).

CAVEAT (learned in round 5): because the wrong validity FEEDS BACK into
planner control flow (problems "solve" instantly when collisions are
missed), the phase walls are NOT a per-component cost attribution of the
production kernel — phase 0/5 runs take far fewer planner steps.  Treat
them as loose lower bounds only; A/B the production kernel on the full
suite to evaluate scan changes (round 5: three vectorized scan variants
all measured slower than the scalar scan despite phase 5 suggesting
loads dominate).  Attribution:

  phase 0: FK + bitmap gate only
  phase 5: chunk-outer scans with synthesized points (no SMEM loads)
  phase 2: full production exact phase (4 = alias)

Usage: python tools/profile_pc_suite.py [robot] [max_problems]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import dataclasses

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.planning import rrtc, simplify
from vamp_mvt_tpu.robots import registry


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "panda"
    max_problems = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    data = mbm.load_problems(robot)
    base = rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get(robot, 1.0),
        max_iterations=4096,
        max_samples=2048,
        max_path=96,
        samples_per_step=16,
        connect_segments=8,
        sample_window=4,
    )
    phases = [int(x) for x in os.environ.get(
        "PC_PHASES", "2,0,5").split(",")]
    for phase in phases:
        s = dataclasses.replace(base, pc_phase=phase)
        suite, timings = mbm.run_suite_pointcloud(
            robot,
            pc_repr="mvt",
            problem_names=list(mbm.STANDARD_SCENARIOS),
            settings=s,
            max_problems=max_problems,
            batch_size=100,
            data=data,
        )
        summ = suite.summary()
        tag = " (PRODUCTION)" if phase == 2 else " (timing only)"
        print(
            f"pc_phase={phase}{tag}: plan {summ['plan_wall_s']:7.3f}s  "
            f"simplify {summ['simplify_wall_s']:7.3f}s  "
            f"solved {summ['solved_problems']}/{summ['valid_problems']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
