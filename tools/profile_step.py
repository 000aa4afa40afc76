"""Megakernel per-step cost decomposition via RRTCSettings.profile_mask.

Builds kernel variants with step components disabled (trace-time constants in
their place — planner RESULTS are meaningless for any mask != -1) and times a
fixed-work run: solve detection off (bit 16), so every problem consumes the
whole max_iterations sample budget and the step count is identical across
variants.  The deltas attribute the per-step wall to sampling/window (bit 1),
NN scans + config gather (bit 2), FK+CC tiles (bit 4), and scalar bookkeeping
(bit 8).

Usage: python tools/profile_step.py [robot] [n_problems] [max_iterations]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.planning import rrtc, rrtc_mega
from vamp_mvt_tpu.ops.kernels.fkcc_pallas import _pc_arrays
from vamp_mvt_tpu.robots import registry

SAMP, NN, FKCC, BOOK, SOLVE = 1, 2, 4, 8, 16
ALL = SAMP | NN | FKCC | BOOK | SOLVE


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "panda"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    spec = registry.load(robot)
    data = mbm.load_problems(robot)
    problems = []
    for pname in mbm.STANDARD_SCENARIOS:
        problems.extend(data["problems"].get(pname, []))
    problems = problems[:B]
    envs, starts, goals, masks = mbm.build_batch(
        problems, cache_key=f"ps_{robot}_{B}"
    )
    G = goals.shape[1]
    d = spec.dimension
    dp = max(8, 8 * ((d + 7) // 8))

    base = rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get(robot, 1.0),
        max_iterations=iters,
        max_samples=2048,
        max_path=96,
        samples_per_step=16,
        connect_segments=8,
        sample_window=4,
    )

    # kernel inputs built once by the SAME helper production uses (the
    # node-row meta lanes must match the kernel's layout exactly); the
    # direct flags are zeroed so every problem exercises the step loop
    ctl, nodes0, _ad, _fd = rrtc_mega.mega_inputs(
        spec, envs, starts, goals, masks, base
    )
    ctl = ctl.at[:, 0, 1].set(0)
    bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags = _pc_arrays(spec, envs)

    def run(mask):
        st = dataclasses.replace(base, profile_mask=mask)

        def args(off):
            # distinct sample offsets: identical dispatches can be served
            # from result caches along the way, timing nothing
            return (spec, st, ctl.at[:, 0, 0].add(off), nodes0, envs.spheres,
                    envs.capsules, envs.z_capsules, envs.cuboids,
                    envs.z_cuboids, bm, ch, pt, su, pcm, stab, att, hfm,
                    hfd, flags, False)

        _, scal = rrtc_mega._run_mega(*args(0))
        np.asarray(scal[0, 0, 0])
        t0 = time.perf_counter()
        _, scal = rrtc_mega._run_mega(*args(1))
        sc = np.asarray(scal)
        dt = time.perf_counter() - t0
        steps = int(sc[:, 0, 9].sum() + sc[:, 0, 10].sum())
        return dt, steps

    variants = [
        ("full (no solve)", ALL & ~SOLVE),
        ("  - FKCC", ALL & ~SOLVE & ~FKCC),
        ("  - FKCC - NN", ALL & ~SOLVE & ~FKCC & ~NN),
        ("  - FKCC - NN - SAMP", ALL & ~SOLVE & ~FKCC & ~NN & ~SAMP),
        ("  - FKCC - NN - SAMP - BOOK", ALL & ~SOLVE & ~FKCC & ~NN & ~SAMP & ~BOOK),
    ]
    print(f"{robot}: {B} problems x {iters} samples, K=16 C=8 W=4")
    prev = None
    for name, mask in variants:
        dt, steps = run(mask)
        us = dt / max(steps, 1) * 1e6
        line = (f"{name:<30} mask {mask & 0x1f:#04x}: {dt*1e3:8.1f} ms  "
                f"{steps:7d} steps  {us:7.2f} us/step")
        if prev is not None and name.startswith("  -"):
            line += f"  (delta {prev - dt:+.3f} s)"
        print(line)
        if name.startswith(("full", "  -")):
            prev = dt


if __name__ == "__main__":
    main()
