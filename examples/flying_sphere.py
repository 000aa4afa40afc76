"""PRM roadmap for an R^3 point robot over a PNG heightfield maze
(reference scripts/flying_sphere.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np

import vamp_mvt_tpu as vmt
from vamp_mvt_tpu.planning import prm
from vamp_mvt_tpu.robots import registry

HEIGHTFIELD = Path("/root/reference/resources/heightfields/maze.png")


def main():
    spec = registry.sphere_spec(lows=(-5, -5, 0), highs=(5, 5, 5), radius=0.2)
    env = vmt.Environment()
    if HEIGHTFIELD.exists():
        meta, data = vmt.png_to_heightfield(HEIGHTFIELD, (0, 0, 0.5), (0.05, 0.05, 0.5))
        env.add_heightfield(meta, data)
    else:  # fallback obstacle course
        for x in np.linspace(-4, 4, 9):
            env.add_sphere(vmt.Sphere([x, 0.0, 1.0], 0.4))

    start, goal = [-4.0, -4.0, 1.0], [4.0, 4.0, 1.0]
    res = prm.solve(
        spec, env.build(), start, [goal],
        prm.PRMSettings(max_samples=2048, wave=64,
                        neighbor_params=prm.PRMStarNeighborParams(3, spec.space_measure())),
    )
    print("solved:", res.solved, "cost:", res.cost, "nodes:", res.size)
    rm = vmt.sphere.roadmap(start, goal, env,
                            prm.PRMSettings(max_samples=512, wave=64,
                                            neighbor_params=prm.PRMStarNeighborParams(3, spec.space_measure())))
    print("roadmap:", rm.vertices.shape[0], "vertices,", len(rm.edges), "edges")


if __name__ == "__main__":
    main()
