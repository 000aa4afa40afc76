"""MBM evaluation CLI (reference scripts/evaluate_mbm.py): plan + simplify a
robot's MotionBenchMaker suite as batched device programs."""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--problem", nargs="*", default=None,
                    help="scenario names (default: the standard suite)")
    ap.add_argument("--max_problems", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=700)
    args = ap.parse_args()

    from vamp_mvt_tpu.bench import mbm

    names = args.problem
    if names is None and args.robot == "panda":
        names = list(mbm.STANDARD_SCENARIOS)
    res = mbm.run_suite(
        args.robot, problem_names=names, max_problems=args.max_problems,
        batch_size=args.batch_size,
    )
    print(json.dumps(res.summary(), indent=2))


if __name__ == "__main__":
    main()
