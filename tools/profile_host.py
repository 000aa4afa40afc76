"""Break down run_suite's end-to-end wall time phase by phase (round-3 #3).

Run on the TPU: python tools/profile_host.py
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
from vamp_mvt_tpu.robots import registry
from vamp_mvt_tpu.ops import fkcc


def main():
    last = [time.perf_counter()]

    def mark(name):
        t = time.perf_counter()
        print(f"{name:<40} {t - last[0]:8.3f}s", flush=True)
        last[0] = t

    data = mbm.load_problems("panda")
    mark("load_problems (cached pickle)")

    problems = []
    for pname in mbm.STANDARD_SCENARIOS:
        problems.extend(data["problems"][pname])
    spec = registry.load("panda")
    mark("flatten+spec")

    envs, starts, goals, masks = mbm.build_batch(problems, cache_key="profile")
    jax.block_until_ready(jax.tree_util.tree_leaves(envs) + [starts, goals, masks])
    mark("build_batch (cold cache)")

    envs, starts, goals, masks = mbm.build_batch(problems, cache_key="profile")
    jax.block_until_ready(jax.tree_util.tree_leaves(envs) + [starts, goals, masks])
    mark("build_batch (warm npz)")

    for tag in ("cold", "warm"):
        np.asarray(mbm._valid_fused(spec, envs, starts, goals, masks))
        mark(f"validity fused ({tag})")

    # the full suite, twice (first = compile warmup, second = honest e2e)
    res = mbm.run_suite(
        "panda", problem_names=list(mbm.STANDARD_SCENARIOS), batch_size=700
    )
    mark("run_suite (with warmup)")
    phases = {}
    res2 = mbm.run_suite(
        "panda", problem_names=list(mbm.STANDARD_SCENARIOS), batch_size=700,
        warmup=False, timings=phases,
    )
    mark("run_suite (warm e2e)")
    for k, v in phases.items():
        print(f"  phase {k:<12} {v:8.3f}s", flush=True)
    s = res2.summary()
    print(f"plan={s['plan_wall_s']:.3f}s simplify={s['simplify_wall_s']:.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
