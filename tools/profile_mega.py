"""Megakernel step decomposition: grow vs connect step counts + per-step cost.

The planner megakernel (planning/rrtc_mega.py) records per-problem grow/connect
step counts in its scalar output (scal[:, 0, 9:11]).  This tool runs the real
MBM suite batch through _run_mega directly and reports the step distribution,
per-step wall cost, and where the iteration budget goes — the measurement
behind the connect-cadence interleave (PARITY roadmap #2).

Usage: python tools/profile_mega.py [robot] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.planning import rrtc, rrtc_mega, validate as validate_mod
from vamp_mvt_tpu.robots import registry


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "panda"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 700

    spec = registry.load(robot)
    data = mbm.load_problems(robot)
    problems = []
    for pname in mbm.STANDARD_SCENARIOS:
        problems.extend(data["problems"].get(pname, []))
    problems = problems[:B]
    pad = (-len(problems)) % B
    problems += [problems[-1]] * pad
    envs, starts, goals, masks = mbm.build_batch(problems, cache_key=f"pm_{robot}_{B}")

    settings = rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get(robot, 1.0),
        max_iterations=4096,
        max_samples=2048,
        max_path=96,
        samples_per_step=16,
        connect_segments=8,
        sample_window=4,
    )

    run = jax.jit(
        lambda e, s, g, m, off: rrtc_mega.plan_batch_mega(
            spec, e, s, g, m, settings, sample_offsets=off
        )
    )
    B_ = starts.shape[0]
    res = run(envs, starts, goals, masks, jnp.zeros(B_, jnp.int32))
    np.asarray(res.solved)  # force full completion through the tunnel
    t0 = time.perf_counter()
    # different sample offsets: an identical dispatch could be served from
    # result caches along the way, timing nothing
    res = run(envs, starts, goals, masks, jnp.ones(B_, jnp.int32))
    np.asarray(res.solved)
    dt = time.perf_counter() - t0

    # re-run _run_mega for the scalar block (cheap: same compiled kernel),
    # with inputs built by the SAME helper the production path uses
    ctl, nodes0, any_direct, _fd = rrtc_mega.mega_inputs(
        spec, envs, starts, goals, masks, settings
    )
    from vamp_mvt_tpu.ops.kernels.fkcc_pallas import _pc_arrays

    bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags = _pc_arrays(spec, envs)

    def kernel_only(off):
        # distinct sample offsets per call: identical dispatches can be
        # served from result caches along the way, timing nothing
        return rrtc_mega._run_mega(
            spec, settings, ctl.at[:, 0, 0].add(off), nodes0, envs.spheres,
            envs.capsules, envs.z_capsules, envs.cuboids, envs.z_cuboids,
            bm, ch, pt, su, pcm, stab, att, hfm, hfd, flags, False,
        )

    _, scal = kernel_only(0)
    np.asarray(scal[0, 0, 0])
    t0 = time.perf_counter()
    _, scal = kernel_only(1)
    np.asarray(scal[0, 0, 0])
    dt_kernel = time.perf_counter() - t0
    sc = np.asarray(scal)[:, 0]
    solved = sc[:, 0] > 0
    gsteps, csteps = sc[:, 9], sc[:, 10]
    total = gsteps + csteps
    print(f"batch {len(problems)}: wall {dt*1e3:.1f} ms "
          f"({dt/len(problems)*1e6:.0f} us/problem)  "
          f"kernel-only {dt_kernel*1e3:.1f} ms "
          f"({dt_kernel/len(problems)*1e6:.0f} us/problem)")
    print(f"solved in-kernel: {int(solved.sum())}  "
          f"direct: {int(np.asarray(any_direct).sum())}")
    for name, v in (("grow steps", gsteps), ("connect steps", csteps),
                    ("total steps", total), ("samples", sc[:, 4]),
                    ("nodes", sc[:, 6])):
        q = np.percentile(v, [50, 90, 99])
        print(f"  {name:<14} p50 {q[0]:7.0f}  p90 {q[1]:7.0f}  "
              f"p99 {q[2]:7.0f}  mean {v.mean():8.1f}  sum {v.sum():9.0f}")
    print(f"per-step wall: {dt_kernel/max(total.sum(),1)*1e9:.0f} ns "
          f"(kernel-only; grid serializes problems per core)")
    print(f"connect share of steps: {csteps.sum()/max(total.sum(),1)*100:.1f}%")


if __name__ == "__main__":
    main()
