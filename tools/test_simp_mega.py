"""Parity check: simplify_batch_mega vs simplify_batch (XLA lockstep).

Plans a small batch with RRTC first so the inputs are realistic paths.
Usage: python tools/test_simp_mega.py [cpu|tpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.planning import rrtc, simplify, simplify_mega
from vamp_mvt_tpu.robots import registry

CAGE = [
    [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
    [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25],
    [0.35, 0.35, 0.8], [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8],
    [-0.35, -0.35, 0.8], [0, -0.55, 0.8], [0.35, -0.35, 0.8],
]
PANDA_START = [0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785]
PANDA_GOAL = [2.35, 1.0, 0.0, -0.8, 0.0, 2.5, 0.785]


def main():
    spec = registry.load("panda")
    b = envmod.EnvironmentBuilder()
    for c in CAGE:
        b.add_sphere(c, 0.2)
    env = b.build()

    B = 8
    rng = np.random.default_rng(1)
    starts = np.tile(np.array(PANDA_START, np.float32), (B, 1))
    goals = np.tile(np.array(PANDA_GOAL, np.float32), (B, 1, 1))
    starts[1:] += rng.normal(0, 0.02, starts[1:].shape).astype(np.float32)
    goals[1:] += rng.normal(0, 0.02, goals[1:].shape).astype(np.float32)
    masks = np.ones((B, 1), bool)
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), env
    )
    starts, goals, masks = jnp.asarray(starts), jnp.asarray(goals), jnp.asarray(masks)

    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=4096, max_samples=1024, max_path=96,
        samples_per_step=8, connect_segments=8, sample_window=2,
    )
    pr = rrtc.plan_batch(spec, envs, starts, goals, masks, settings)
    jax.block_until_ready(pr)
    print("planned:", np.asarray(pr.solved), "lengths:", np.asarray(pr.path_length))

    ss = simplify.SimplifySettings()
    t0 = time.perf_counter()
    ref = simplify.simplify_batch(spec, envs, pr.path, pr.path_length, ss)
    jax.block_until_ready(ref)
    t1 = time.perf_counter()
    mega = simplify_mega.simplify_batch_mega(spec, envs, pr.path, pr.path_length, ss)
    jax.block_until_ready(mega)
    t2 = time.perf_counter()
    print(f"ref  : {t1-t0:.2f}s  mega: {t2-t1:.2f}s (incl compile)")

    for f in ("path_length", "cost", "iterations"):
        r = np.asarray(getattr(ref, f))
        m = np.asarray(getattr(mega, f))
        match = np.allclose(r, m, rtol=1e-5, atol=1e-5)
        print(f"{f:<14} match={match}\n  ref={r}\n  mega={m}")
    pr_, pm = np.asarray(ref.path), np.asarray(mega.path)
    for i in range(B):
        L = int(np.asarray(ref.path_length)[i])
        Lm = int(np.asarray(mega.path_length)[i])
        if L == Lm and np.allclose(pr_[i, :L], pm[i, :L], atol=1e-5):
            continue
        print(f"problem {i}: path mismatch (len {L} vs {Lm})")
        print("  ref :", pr_[i, :max(L, 2)][:4])
        print("  mega:", pm[i, :max(Lm, 2)][:4])


if __name__ == "__main__":
    main()
