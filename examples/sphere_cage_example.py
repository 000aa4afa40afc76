"""Panda-in-sphere-cage benchmark (reference scripts/sphere_cage_example.py).

The reference loops 100 perturbed trials serially; here all trials plan and
simplify as ONE lockstep device batch.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

import vamp_mvt_tpu as vmt
from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import rrtc, rrtc_mega, simplify, simplify_mega
from vamp_mvt_tpu.robots import registry

A = [0., -0.785, 0., -2.356, 0., 1.571, 0.785]
B = [2.35, 1., 0., -0.8, 0, 2.5, 0.785]
CAGE = [
    [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
    [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25],
    [0.35, 0.35, 0.8], [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8],
    [-0.35, -0.35, 0.8], [0, -0.55, 0.8], [0.35, -0.35, 0.8],
]


def main(n_trials: int = 100, variation: float = 0.01, radius: float = 0.2):
    spec = registry.load("panda")
    rng = np.random.default_rng(0)
    envs = []
    for _ in range(n_trials):
        b = envmod.EnvironmentBuilder()
        order = rng.permutation(len(CAGE))
        for i in order:
            c = np.asarray(CAGE[i]) + rng.uniform(-variation, variation, 3)
            b.add_sphere(c, radius)
        envs.append(b.build())
    batched = envmod.stack_environments(envs)

    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=4096, max_samples=4096, max_path=96,
        samples_per_step=16, connect_segments=8,
    )
    starts = jnp.broadcast_to(jnp.asarray(A, jnp.float32), (n_trials, 7))
    goals = jnp.broadcast_to(jnp.asarray([B], jnp.float32), (n_trials, 1, 7))
    masks = jnp.ones((n_trials, 1), bool)

    # production path on TPU = the per-problem megakernels; the lockstep
    # XLA planner stays the CPU/portable path
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        plan = jax.jit(
            lambda e, s, g, m, o: rrtc_mega.plan_batch_mega(
                spec, e, s, g, m, settings, sample_offsets=o
            )
        )
        simp = jax.jit(
            lambda e, p, l: simplify_mega.simplify_batch_mega(
                spec, e, p, l, simplify.SimplifySettings(pair_chunk=64)
            )
        )
    else:
        plan = jax.jit(
            lambda e, s, g, m, o: rrtc.plan_batch(
                spec, e, s, g, m, settings, o
            )
        )
        simp = jax.jit(
            lambda e, p, l: simplify.simplify_batch(
                spec, e, p, l, simplify.SimplifySettings(pair_chunk=64)
            )
        )
    offs = jnp.zeros(n_trials, jnp.int32)
    # warm BOTH programs, then time with a different sample offset —
    # identical repeat dispatches can be served from result caches and
    # "measure" nothing
    r = plan(batched, starts, goals, masks, offs)
    s = simp(batched, r.path, r.path_length)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    r = plan(batched, starts, goals, masks, offs + 100)
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    s = simp(batched, r.path, r.path_length)
    jax.block_until_ready(s)
    t2 = time.perf_counter()

    solved = int(np.asarray(r.solved).sum())
    print(f"solved {solved}/{n_trials}")
    print(f"plan {1e3*(t1-t0):.1f} ms, simplify {1e3*(t2-t1):.1f} ms "
          f"-> {n_trials/(t2-t0):.0f} trials/s")
    print(f"initial cost median {np.median(np.asarray(r.cost)[np.asarray(r.solved)]):.2f}, "
          f"simplified {np.median(np.asarray(s.cost)[np.asarray(r.solved)]):.2f}")


if __name__ == "__main__":
    main(*map(int, sys.argv[1:2]))
