"""MPNet-vs-MBM evaluation (reference scripts/evaluate_mbm_mpnet.py).

Runs the MPNet neural planner over MBM problems with pointcloud (MVT or CAPT)
environments, with RRTC fallback accounting, and prints per-problem results +
an aggregate table.  Without trained checkpoint files the MLPs run with
randomly initialized weights (useful only for exercising the pipeline); pass
--encoder/--planner to load torch state dicts exported by
examples/prepare_mpnet_dataset.py training runs.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--problem", nargs="*", default=["bookshelf_small"])
    ap.add_argument("--index", type=int, nargs="*", default=None)
    ap.add_argument("--max_problems", type=int, default=10)
    ap.add_argument("--encoder", default=None, help="encoder state-dict path")
    ap.add_argument("--planner", default=None, help="planner state-dict path")
    ap.add_argument("--pc_repr", default="mvt", choices=["mvt", "capt"])
    ap.add_argument("--filter_type", default="scdf",
                    choices=["scdf", "centervox"])
    ap.add_argument("--samples_per_object", type=int, default=10000)
    ap.add_argument("--no_fallback", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from vamp_mvt_tpu.bench import mbm
    from vamp_mvt_tpu.planning import mpnet
    from vamp_mvt_tpu.pointcloud import pipeline

    data = mbm.load_problems(args.robot)
    rows = []
    for pname in args.problem:
        plist = data["problems"][pname]
        if args.index:
            plist = [p for p in plist if p["index"] in args.index]
        for problem in plist[: args.max_problems]:
            builder, _, filtered, _, _ = pipeline.problem_to_pointcloud_env(
                args.robot, problem, pc_repr=args.pc_repr,
                samples_per_object=args.samples_per_object,
                filter_type=args.filter_type,
            )
            t0 = time.perf_counter()
            path, mode = mpnet.plan_with_mpnet(
                args.robot, problem["start"], problem["goals"][0], builder,
                filtered, encoder_path=args.encoder,
                planner_path=args.planner,
                rrtc_fallback=not args.no_fallback,
            )
            dt = time.perf_counter() - t0
            cost = (
                sum(
                    float(np.linalg.norm(np.asarray(b) - np.asarray(a)))
                    for a, b in zip(path[:-1], path[1:])
                )
                if path is not None and len(path) >= 2
                else float("inf")
            )
            rows.append((pname, problem["index"], mode, cost, dt))
            print(f"{pname}[{problem['index']}]: {mode} "
                  f"cost={cost:.3f} {dt*1e3:.1f} ms")

    solved = [r for r in rows if r[2] in ("mpnet", "rrtc_fallback")]
    neural = [r for r in rows if r[2] == "mpnet"]
    print(f"\n{len(solved)}/{len(rows)} solved "
          f"({len(neural)} purely neural, "
          f"{len(solved) - len(neural)} via RRTC fallback)")
    if solved:
        print(f"median cost {np.median([r[3] for r in solved]):.3f}, "
              f"median wall {np.median([r[4] for r in solved])*1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
