"""MBM evaluation CLI (reference scripts/evaluate_mbm.py): plan + simplify a
robot's MotionBenchMaker suite as batched device programs.

Also runs pre-converted robometrics datasets via --problems_pkl (the pickle
layout produced by the reference's resources/robometrics_to_pkl_json.py)."""
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
    ap.add_argument("--problems_pkl", default=None,
                    help="pre-converted problem pickle (e.g. a robometrics "
                         "dataset) instead of the MBM tarball")
    ap.add_argument("--max_problems", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=700)
    ap.add_argument("--planner", default="auto", choices=["auto", "mega", "xla"])
    ap.add_argument("--table", action="store_true",
                    help="print the percentile table as well")
    args = ap.parse_args()

    from vamp_mvt_tpu.bench import mbm

    data = None
    names = args.problem
    if args.problems_pkl:
        data = mbm.load_problems_pkl(args.problems_pkl)
    elif names is None and args.robot == "panda":
        names = list(mbm.STANDARD_SCENARIOS)
    res = mbm.run_suite(
        args.robot, problem_names=names, max_problems=args.max_problems,
        batch_size=args.batch_size, planner=args.planner, data=data,
    )
    print(json.dumps(res.summary(), indent=2))
    if args.table:
        print(res.percentile_table())


if __name__ == "__main__":
    main()
