"""Extract behavioral data (not code) from the reference's generated robot headers.

Per robot (reference: src/impl/vamp/robots/*.hh):
  - sphere radii in reference index order (constant `out.r[k]`/`y[4k+3]` assignments in sphere_fk)
  - self-collision sphere-index pairs (`output.second.emplace_back(i, j)` in fkcc_debug)
  - scaling constants s_m (range) / s_a (low) arrays => joint limits used by the reference
Used to validate our URDF-derived robot specs and to build self-collision masks.
"""
import re, json
from pathlib import Path

REF = Path("/root/reference/src/impl/vamp/robots")

def func_region(text, name):
    # region from `name(` declaration to the next top-level function decl
    starts = [m.start() for m in re.finditer(r"inline static (?:void|bool|auto) (\w+)\(", text)]
    names = [re.match(r"inline static (?:void|bool|auto) (\w+)\(", text[s:]).group(1) for s in starts]
    for i, (s, n) in enumerate(zip(starts, names)):
        if n == name:
            end = starts[i + 1] if i + 1 < len(starts) else len(text)
            return text[s:end]
    return ""

def floats_array(text, name):
    m = re.search(name + r"\{([^}]*)\}", text)
    return [float(x) for x in re.findall(r"[-+0-9.e]+", m.group(1))] if m else None

def extract(robot):
    text = (REF / f"{robot}.hh").read_text()
    debug = func_region(text, "fkcc_debug")
    sfk = func_region(text, "sphere_fk")
    pairs = [(int(a), int(b)) for a, b in re.findall(r"output\.second\.emplace_back\((\d+), (\d+)\)", debug)]
    radii = {}
    for m in re.finditer(r"y\[(\d+)\] = ([0-9.e+-]+);", sfk):
        k, v = int(m.group(1)), float(m.group(2))
        if k % 4 == 3:
            radii.setdefault(k // 4, v)
    # also capture `out.r[...] = ...` direct forms
    for m in re.finditer(r"out\.r\[(\d+)\] = ([0-9.e+-]+);", sfk):
        radii.setdefault(int(m.group(1)), float(m.group(2)))
    n_decl = int(re.search(r"n_spheres = (\d+)", text).group(1))
    rlist = [radii.get(i) for i in range(n_decl)]
    return {
        "n_spheres": n_decl,
        "radii": rlist,
        "n_radii_const": sum(r is not None for r in rlist),
        "self_collision_pairs": sorted(set(pairs)),
        "s_m": floats_array(text, "s_m"), "s_a": floats_array(text, "s_a"),
    }

out = {}
for robot in ["panda", "ur5", "fetch", "baxter"]:
    out[robot] = extract(robot)
    d = out[robot]
    mx = max((max(p) for p in d["self_collision_pairs"]), default=-1)
    print(robot, "n_spheres:", d["n_spheres"], "const radii:", d["n_radii_const"],
          "pairs:", len(d["self_collision_pairs"]), "max pair idx:", mx)
Path("vamp_mvt_tpu/robots/_reference_data.json").write_text(json.dumps(out))
