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
    ap.add_argument("--pointcloud", action="store_true",
                    help="plan against sampled pointclouds instead of "
                         "primitives (reference evaluate_mbm.py:106-136)")
    ap.add_argument("--pc_repr", default="capt", choices=["capt", "mvt"])
    ap.add_argument("--filter_type", default="scdf", choices=["scdf", "centervox"])
    ap.add_argument("--samples_per_object", type=int, default=10000)
    args = ap.parse_args()

    from vamp_mvt_tpu.bench import mbm

    data = None
    names = args.problem
    if args.problems_pkl:
        data = mbm.load_problems_pkl(args.problems_pkl)
    elif names is None and args.robot == "panda":
        names = list(mbm.STANDARD_SCENARIOS)
    if args.pointcloud:
        res, timings = mbm.run_suite_pointcloud(
            args.robot, pc_repr=args.pc_repr, filter_type=args.filter_type,
            problem_names=names, max_problems=args.max_problems,
            batch_size=args.batch_size, data=data,
            samples_per_object=args.samples_per_object,
        )
        out = res.summary()
        out["filter_median_ms"] = timings["filter_median_ms"]
        out["build_median_ms"] = timings["build_median_ms"]
        out["pc_repr"] = timings["pc_repr"]
        out["filter_type"] = timings["filter_type"]
        print(json.dumps(out, indent=2))
    else:
        res = mbm.run_suite(
            args.robot, problem_names=names, max_problems=args.max_problems,
            batch_size=args.batch_size, planner=args.planner, data=data,
        )
        print(json.dumps(res.summary(), indent=2))
    if args.table:
        print(res.percentile_table())


if __name__ == "__main__":
    main()
