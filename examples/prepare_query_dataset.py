"""Dump filtered clouds + collision queries for external NN-library comparison
(reference scripts/prepare_nanoflann_dataset.py): for each problem, the
filtered pointcloud and a set of (sphere center, radius, collides) records
generated from robot configurations along solution paths."""
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
    ap.add_argument("--count", type=int, default=5)
    ap.add_argument("--out", default="/tmp/query_dataset")
    args = ap.parse_args()

    import jax.numpy as jnp
    from vamp_mvt_tpu.bench import mbm
    from vamp_mvt_tpu.collision.mvt import mvt_collides
    from vamp_mvt_tpu.ops import fk
    from vamp_mvt_tpu.pointcloud import pipeline
    from vamp_mvt_tpu.robots import registry

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spec = registry.load(args.robot)
    data = mbm.load_problems(args.robot)
    rng = np.random.default_rng(0)
    for i, prob in enumerate(data["problems"][args.problem][: args.count]):
        b, _, filt, _, _ = pipeline.problem_to_pointcloud_env(
            args.robot, prob, pc_repr="mvt", samples_per_object=2000
        )
        env = b.build()
        qs = rng.uniform(spec.limits_low, spec.limits_high, (64, spec.dimension))
        centers = np.asarray(
            fk.sphere_positions(spec, jnp.asarray(qs, jnp.float32))
        ).reshape(-1, 3)
        radii = np.tile(spec.sphere_radius, 64)
        hits = np.asarray(
            mvt_collides(env.mvt, jnp.asarray(centers), jnp.asarray(radii))
        )
        np.savez(
            out / f"{args.problem}_{i}.npz",
            pointcloud=np.asarray(filt, np.float32),
            query_centers=centers.astype(np.float32),
            query_radii=radii.astype(np.float32),
            collides=hits,
        )
    print(json.dumps({"written": args.count, "dir": str(out)}))


if __name__ == "__main__":
    main()
