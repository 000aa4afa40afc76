"""Export parsed MBM problems to the flat text format of tools/ref_validate.cc.

Values are exactly what vamp_mvt_tpu.bench.mbm feeds its own environment
builder (including the 'box' problem cylinder->cuboid hack), so the C++
reference oracle and this repo validate identical inputs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from vamp_mvt_tpu.bench import mbm


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "ur5"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/{robot}_problems.txt"
    data = mbm.load_problems(robot)
    fmt = lambda vals: " ".join(repr(float(v)) for v in vals)
    n = 0
    with open(out, "w") as f:
        for pname, plist in data["problems"].items():
            for p in plist:
                f.write(f"P {pname} {p['index']} {len(p['goals'])}\n")
                for o in p["sphere"]:
                    f.write(f"S {fmt(o['position'])} {o['radius']!r}\n")
                if p["problem"] == "box":
                    for o in p["cylinder"]:
                        f.write(
                            f"B {fmt(o['position'])} "
                            f"{fmt(o['orientation_euler_xyz'])} "
                            f"{fmt([o['radius'], o['radius'], o['length'] / 2])}\n"
                        )
                else:
                    for o in p["cylinder"]:
                        f.write(
                            f"C {fmt(o['position'])} "
                            f"{fmt(o['orientation_euler_xyz'])} "
                            f"{o['radius']!r} {o['length']!r}\n"
                        )
                for o in p["box"]:
                    f.write(
                        f"B {fmt(o['position'])} "
                        f"{fmt(o['orientation_euler_xyz'])} "
                        f"{fmt(o['half_extents'])}\n"
                    )
                f.write(f"q {fmt(p['start'])}\n")
                for g in p["goals"]:
                    f.write(f"g {fmt(g)}\n")
                n += 1
    print(f"wrote {n} problems to {out}")


if __name__ == "__main__":
    main()
