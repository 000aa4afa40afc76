"""End-effector attachment demo (reference scripts/attachments.py):
carry a spherical payload through the sphere cage."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import vamp_mvt_tpu as vmt
from examples.sphere_cage_example import A, B, CAGE


def main():
    env = vmt.Environment()
    for c in CAGE:
        env.add_sphere(vmt.Sphere(c, 0.2))
    env.attach(vmt.Attachment(spheres=[[0.0, 0.0, 0.12, 0.06]]))

    assert vmt.panda.validate(A, env), "start invalid with payload"
    res = vmt.panda.rrtc(A, B, env)
    print("solved:", bool(res.solved), "cost:", float(res.cost))
    simple = vmt.panda.simplify(res.path, res.path_length, env)
    print("simplified cost:", float(simple.cost),
          "vertices:", int(simple.path_length))


if __name__ == "__main__":
    main()
