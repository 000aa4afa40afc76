"""Round-2 profiling: op-level breakdown of the bench hot loop on TPU.

Usage: python tools/profile_r2.py [seg|kernel|nn]
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
from vamp_mvt_tpu.utils import profiling


def bench_settings():
    return rrtc.RRTCSettings(
        range=registry.RRT_RANGES.get("panda", 1.0),
        max_iterations=4096,
        max_samples=512,
        max_path=96,
        samples_per_step=16,
        connect_segments=8,
        sample_window=4,
    )


def setup():
    spec = registry.load("panda")
    data = mbm.load_problems("panda")
    problems = []
    for pname in mbm.STANDARD_SCENARIOS:
        problems.extend(data["problems"][pname])
    envs, starts, goals, masks = mbm.build_batch(problems)
    return spec, envs, starts, goals, masks


def profile_segment():
    spec, envs, starts, goals, masks = setup()
    s = bench_settings()
    num_points = validate_mod.n_points_bound(spec, s.range)
    print(f"num_points={num_points} K={s.samples_per_step} C={s.connect_segments} "
          f"W={s.sample_window} M={s.max_samples} B={starts.shape[0]}")
    env_counts = {f: getattr(envs, f).shape for f in
                  ("spheres", "capsules", "z_capsules", "cuboids", "z_cuboids")}
    print("env caps:", env_counts)

    init_fn = jax.jit(jax.vmap(
        lambda e, st, g, m, o: rrtc._init_state(spec, e, st, g, m, s, o)))
    seg_fn = jax.jit(jax.vmap(
        lambda e, st: rrtc._run_steps(spec, s, e, st, num_points, max_steps=8)))

    offs = jnp.zeros(starts.shape[0], jnp.int32)
    st, ad, fd = init_fn(envs, starts, goals, masks, offs)
    st = seg_fn(envs, st)  # warm
    jax.block_until_ready(st)

    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        st = seg_fn(envs, st)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / reps
    print(f"seg_fn(8 steps, B={starts.shape[0]}): {dt*1e3:.1f} ms "
          f"= {dt/8*1e3:.2f} ms/step")

    logdir = "/tmp/prof_seg"
    with profiling.trace(logdir):
        st = seg_fn(envs, st)
        jax.block_until_ready(st)
    for name, dur, cnt in profiling.op_breakdown(logdir, top=30):
        print(f"{dur/1000.0:10.2f} ms  x{cnt:<5} {name[:110]}")


def profile_kernel():
    from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp
    spec, envs, starts, goals, masks = setup()
    B = starts.shape[0]
    s = bench_settings()
    num_points = validate_mod.n_points_bound(spec, s.range)
    n = (s.samples_per_step + s.connect_segments) * num_points
    q = jnp.zeros((B, spec.dimension, n), jnp.float32) + starts[:, :, None]
    f = jax.jit(lambda e, q: fp.fkcc_pallas_batched_lanes(spec, e, q))
    out = f(envs, q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        out = f(envs, q)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    G = max((n + fp.BLOCK - 1) // fp.BLOCK, 1)
    blocks = B * G
    print(f"fkcc kernel: B={B} n={n} G={G} blocks={blocks} "
          f"{dt*1e3:.2f} ms -> {dt/blocks*1e6:.2f} us/block, "
          f"{B*n/dt/1e6:.1f} M configs/s")


def profile_nn():
    spec, envs, starts, goals, masks = setup()
    s = bench_settings()
    B = starts.shape[0]
    M, KW = s.max_samples, s.samples_per_step * s.sample_window
    configs = jnp.zeros((B, M, spec.dimension), jnp.float32)
    samples = jnp.zeros((B, KW, spec.dimension), jnp.float32)
    maska = jnp.ones((B, M), bool)

    def nn(configs, samples, maska):
        d2a = jnp.sum((configs[:, None] - samples[:, :, None]) ** 2, axis=-1)
        d2a = jnp.where(maska[:, None], d2a, jnp.inf)
        nearest = jnp.argmin(d2a, axis=-1)
        nd = jnp.sqrt(jnp.take_along_axis(d2a, nearest[..., None], -1)[..., 0])
        return nearest, nd

    f = jax.jit(nn)
    out = f(configs, samples, maska)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        out = f(configs, samples, maska)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"NN (B={B}, KW={KW}, M={M}): {dt*1e3:.2f} ms/step-equivalent")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "seg"
    dict(seg=profile_segment, kernel=profile_kernel, nn=profile_nn)[what]()
