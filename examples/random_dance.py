"""Random replanning smoke test (reference scripts/random_dance.py):
plan between random valid configurations in the cage, repeatedly."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np

import vamp_mvt_tpu as vmt
from examples.sphere_cage_example import CAGE


def main(rounds: int = 5):
    env = vmt.Environment()
    for c in CAGE:
        env.add_sphere(vmt.Sphere(c, 0.2))
    spec = vmt.panda.spec
    rng = np.random.default_rng(0)

    def random_valid():
        while True:
            q = rng.uniform(spec.limits_low, spec.limits_high)
            if vmt.panda.validate(q, env):
                return q

    cur = random_valid()
    for i in range(rounds):
        goal = random_valid()
        res = vmt.panda.rrtc(cur, goal, env)
        status = "ok" if bool(res.solved) else "FAILED"
        print(f"round {i}: {status} cost={float(res.cost):.2f}")
        if bool(res.solved):
            cur = goal


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
