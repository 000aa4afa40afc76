"""Cold-start decomposition: wall time of each program compile in the suite.

Usage: python tools/probe_compile.py [--nocache]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "--nocache" not in sys.argv:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.bench import mbm
from vamp_mvt_tpu.planning import rrtc, rrtc_mega, simplify, simplify_mega
from vamp_mvt_tpu.robots import registry

T0 = time.perf_counter()


def mark(name):
    print(f"[{time.perf_counter() - T0:8.1f}s] {name}", flush=True)


def main():
    spec = registry.load("panda")
    data = mbm.load_problems("panda")
    problems = []
    for pname in mbm.STANDARD_SCENARIOS:
        problems.extend(data["problems"][pname])
    problems = problems[:700]
    envs, starts, goals, masks = mbm.build_batch(problems, cache_key="probe700")
    jax.block_until_ready(envs)
    mark("build_batch done")

    settings = rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get("panda", 1.0),
        max_iterations=4096, max_samples=2048, max_path=96,
        samples_per_step=16, connect_segments=8, sample_window=4,
    )
    retry_settings = dataclasses.replace(
        settings, max_iterations=32 * 4096, max_samples=16384
    )
    simp_settings = simplify.SimplifySettings(pair_chunk=64)

    r = mbm._valid_fused(spec, envs, starts, goals, masks)
    jax.block_until_ready(r)
    mark("valid_fused compiled+run")

    plan_fn = jax.jit(
        lambda e, s, g, m: rrtc_mega.plan_batch_mega(spec, e, s, g, m, settings)
    )
    pr = plan_fn(envs, starts, goals, masks)
    jax.block_until_ready(pr)
    mark("plan mega (B=700, M=2048) compiled+run")
    t = time.perf_counter()
    pr = plan_fn(envs, starts, goals, masks)
    jax.block_until_ready(pr)
    mark(f"plan mega warm: {time.perf_counter() - t:.3f}s")

    retry_fn = jax.jit(
        lambda e, s, g, m: rrtc_mega.plan_batch_mega(
            spec, e, s, g, m, retry_settings
        )
    )
    take = jnp.arange(16)
    sub = mbm._gather_sub((envs, starts, goals, masks), take)
    rr = retry_fn(*sub)
    jax.block_until_ready(rr.solved)
    mark("retry mega (B=16, M=16384) compiled+run")

    simp_fn = jax.jit(
        lambda e, p, l: simplify_mega.simplify_batch_mega(
            spec, e, p, l, simp_settings
        )
    )
    sr = simp_fn(envs, pr.path, pr.path_length)
    jax.block_until_ready(sr)
    mark("simplify mega (B=700) compiled+run")
    t = time.perf_counter()
    sr = simp_fn(envs, pr.path, pr.path_length)
    jax.block_until_ready(sr)
    mark(f"simplify mega warm: {time.perf_counter() - t:.3f}s")


if __name__ == "__main__":
    main()
