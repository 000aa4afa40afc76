"""Problems/s scaling across a virtual device mesh (CPU host devices).

Demonstrates the problem-batch data-parallel scaling mechanism on an
8-virtual-device mesh (no multi-chip TPU hardware is available in this
environment; on a real slice the same code shards over ICI).

Usage: python tools/bench_scaling.py [batch_per_device] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.parallel import mesh as meshmod
from vamp_mvt_tpu.planning import rrtc
from vamp_mvt_tpu.robots import registry


def main():
    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    b = envmod.EnvironmentBuilder()
    for y in np.linspace(-3, 3, 13):
        for z in np.linspace(0, 3, 7):
            if y > 2.0 and z > 2.0:
                continue
            b.add_sphere([0.0, y, z], 0.3)
    env = b.build()
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=iters, max_samples=512, max_path=64,
        samples_per_step=4, connect_segments=2, sample_window=2,
    )

    results = {}
    for n_dev in (1, 2, 4, 8):
        B = per_dev * n_dev
        envs = envmod.stack_environments([env] * B)
        starts = jnp.broadcast_to(jnp.asarray([-2.0, 0.0, 1.0]), (B, 3))
        goals = (
            jnp.broadcast_to(jnp.asarray([[2.0, 0.0, 1.0]]), (B, 1, 3))
            + (jnp.arange(B, dtype=jnp.float32) % 16)[:, None, None] * 0.02
        )
        masks = jnp.ones((B, 1), bool)
        mesh = meshmod.make_mesh(n_dev)
        run = lambda: meshmod.plan_batch_sharded(
            spec, mesh, envs, starts, goals, masks, settings
        )
        jax.block_until_ready(run())  # compile
        t0 = time.perf_counter()
        r = run()
        jax.block_until_ready(r)
        el = time.perf_counter() - t0
        solved = int(np.asarray(r.solved).sum())
        results[n_dev] = B / el
        print(
            f"devices={n_dev}  B={B:>4}  {el:7.3f}s  {B/el:8.1f} problems/s  "
            f"solved {solved}/{B}  speedup vs 1-dev {results[n_dev]/results[1]:.2f}x"
        )


if __name__ == "__main__":
    main()
