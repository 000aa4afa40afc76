"""Visualize an MBM problem + planned path (reference scripts/visualize_mbm.py).

Loads one MotionBenchMaker problem, builds the environment (primitive or
pointcloud MVT/CAPT), plans with the chosen planner, simplifies, and renders:

- matplotlib workspace plot (sphere-sweep of the path through the obstacle
  scene) + per-joint trajectory plot, saved next to this script, and
- optionally a PyBullet animation when pybullet + a URDF are available
  (--pybullet URDF_PATH), mirroring the reference's interactive viewer.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--planner", default="rrtc",
                    choices=["rrtc", "prm", "fcit", "aorrtc"])
    ap.add_argument("--problem", default="bookshelf_small")
    ap.add_argument("--index", type=int, default=1)
    ap.add_argument("--pointcloud", action="store_true")
    ap.add_argument("--pc_repr", default="mvt", choices=["mvt", "capt"])
    ap.add_argument("--filter_type", default="scdf",
                    choices=["scdf", "centervox"])
    ap.add_argument("--samples_per_object", type=int, default=10000)
    ap.add_argument("--out", default=None, help="output image path prefix")
    ap.add_argument("--pybullet", default=None, metavar="URDF",
                    help="animate in PyBullet with this robot URDF")
    args = ap.parse_args()

    import numpy as np

    from vamp_mvt_tpu import api, visualize
    from vamp_mvt_tpu.bench import mbm
    from vamp_mvt_tpu.pointcloud import pipeline

    data = mbm.load_problems(args.robot)
    plist = data["problems"][args.problem]
    problem = next(p for p in plist if p["index"] == args.index)

    module = api.RobotModule(args.robot)
    if args.pointcloud:
        builder, _, filtered, filter_ns, build_ns = (
            pipeline.problem_to_pointcloud_env(
                args.robot, problem, pc_repr=args.pc_repr,
                samples_per_object=args.samples_per_object,
                filter_type=args.filter_type,
            )
        )
        print(f"filter {filter_ns/1e6:.2f} ms, {args.pc_repr} build "
              f"{build_ns/1e6:.2f} ms, {len(filtered)} points")
        env = builder
    else:
        env = mbm.problem_to_builder(problem)

    plan = getattr(module, args.planner)
    res = plan(problem["start"], problem["goals"], env)
    if not bool(res.solved):
        print("problem not solved within budget")
        return 1
    simp = module.simplify(res.path, res.path_length, env)
    L = int(simp.path_length)
    path = np.asarray(simp.path)[:L]
    print(f"solved: cost {float(res.cost):.3f} -> {float(simp.cost):.3f}, "
          f"{L} vertices")

    prefix = args.out or str(
        Path(__file__).parent / f"mbm_{args.robot}_{args.problem}_{args.index}"
    )
    # one helper call: problem scene + solved path (+ pointcloud overlay)
    visualize.render_problem(
        args.robot, problem, path=path,
        pointcloud=filtered if args.pointcloud else None,
        out_path=prefix + "_workspace.png",
    )
    visualize.plot_joint_trajectories(path, L, out_path=prefix + "_joints.png")
    print(f"wrote {prefix}_workspace.png, {prefix}_joints.png")

    if args.pybullet:
        sim = visualize.PyBulletVisualizer(args.pybullet, gui=True)
        sim.add_environment_from_problem_dict(problem)
        if args.pointcloud:
            sim.draw_pointcloud(filtered)
        sim.animate(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
