"""Quick profiling of the MBM suite: where does plan wall time go?

Instruments plan_batch_compact segment-by-segment and microbenches the fkcc
kernel and a single lockstep step.
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
from vamp_mvt_tpu.planning import rrtc, validate as validate_mod
from vamp_mvt_tpu.robots import registry
from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp


def timeit(f, n=20):
    f()  # warm
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    spec = registry.load("panda")
    data = mbm.load_problems("panda")
    problems = []
    for pname in mbm.STANDARD_SCENARIOS:
        problems.extend(data["problems"][pname])
    envs, starts, goals, masks = mbm.build_batch(problems)
    B = starts.shape[0]
    print(f"B={B}")

    settings = rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get("panda", 1.0),
        max_iterations=4096,
        max_samples=512,
        max_path=96,
        samples_per_step=16,
        connect_segments=8,
        sample_window=4,
    )
    num_points = validate_mod.n_points_bound(spec, settings.range)
    print(f"num_points per edge = {num_points}")

    # --- microbench: raw fkcc kernel throughput
    for nblk in (1, 8, 64, 512):
        n = nblk * 1024
        q = jnp.zeros((7, n), jnp.float32)
        env1 = jax.tree_util.tree_map(lambda a: a[0], envs)
        f = jax.jit(lambda q: fp.fkcc_hot_lanes(spec, env1, q))
        t = timeit(lambda: f(q))
        print(f"fkcc lanes {nblk:4d} blocks: {t*1e6:9.1f} us total, {t/nblk*1e6:7.2f} us/block")

    # --- microbench: one lockstep segment (full B) at various segment lengths
    num_points_b = validate_mod.n_points_bound(spec, settings.range)
    init_fn = jax.jit(
        jax.vmap(lambda e, st, g, m, o: rrtc._init_state(spec, e, st, g, m, settings, o))
    )
    offs = jnp.zeros(B, jnp.int32)
    st, ad, fd = init_fn(envs, starts, goals, masks, offs)
    jax.block_until_ready(st)

    for prefix in (512,):
        seg = jax.jit(
            jax.vmap(
                lambda e, s0, ms: rrtc._run_steps(
                    spec, settings, e, s0, num_points_b, max_steps=ms, nn_prefix=prefix
                ),
                in_axes=(0, 0, None),
            )
        )
        for steps in (1, 8):
            t = timeit(lambda: seg(envs, st, jnp.int32(steps)), n=3)
            print(f"segment B={B} prefix={prefix} steps={steps}: {t*1e3:8.2f} ms  ({t/steps*1e3:6.2f} ms/step)")

    # --- instrumented full plan run
    t0 = time.perf_counter()
    res = rrtc.plan_batch_compact(spec, envs, starts, goals, masks, settings, segment_steps=64)
    jax.block_until_ready(res.solved)
    t1 = time.perf_counter()
    print(f"plan_batch_compact warm total: {t1-t0:8.3f} s (includes compile)")
    t0 = time.perf_counter()
    res = rrtc.plan_batch_compact(spec, envs, starts, goals, masks, settings, segment_steps=64)
    jax.block_until_ready(res.solved)
    t1 = time.perf_counter()
    print(f"plan_batch_compact hot total:  {t1-t0:8.3f} s")
    iters = np.asarray(res.iterations)
    print(f"solved={int(np.asarray(res.solved).sum())}, samples median={np.median(iters):.0f} mean={iters.mean():.0f} p95={np.percentile(iters,95):.0f} max={iters.max()}")


if __name__ == "__main__":
    main()
