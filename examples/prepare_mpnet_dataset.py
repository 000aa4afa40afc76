"""Dump MPNet training data (reference scripts/prepare_mpnet_dataset.py):
per problem, the filtered pointcloud and an RRTC+simplify solution path."""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--problem", default="cage")
    ap.add_argument("--count", type=int, default=10)
    ap.add_argument("--out", default="/tmp/mpnet_dataset")
    ap.add_argument("--samples_per_object", type=int, default=2000)
    args = ap.parse_args()

    import vamp_mvt_tpu as vmt
    from vamp_mvt_tpu.bench import mbm
    from vamp_mvt_tpu.pointcloud import pipeline

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data = mbm.load_problems(args.robot)
    module = vmt.RobotModule(args.robot)
    n_ok = 0
    for i, prob in enumerate(data["problems"][args.problem][: args.count]):
        b, orig, filt, _, _ = pipeline.problem_to_pointcloud_env(
            args.robot, prob, pc_repr="mvt",
            samples_per_object=args.samples_per_object,
        )
        res = module.rrtc(prob["start"], prob["goals"], b.build())
        if not bool(res.solved):
            continue
        simple = module.simplify(res.path, res.path_length, b.build())
        L = int(simple.path_length)
        np.savez(
            out / f"{args.problem}_{i}.npz",
            pointcloud=np.asarray(filt, np.float32),
            path=np.asarray(simple.path)[:L],
            start=np.asarray(prob["start"], np.float32),
            goal=np.asarray(prob["goals"][0], np.float32),
        )
        n_ok += 1
    print(json.dumps({"written": n_ok, "dir": str(out)}))


if __name__ == "__main__":
    main()
