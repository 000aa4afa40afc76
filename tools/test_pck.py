"""Parity check: Pallas kernel pointcloud path vs the XLA MVT query.

Builds a cage pointcloud env (MVT + kernel structure), evaluates fkcc on
random configurations through both paths, and compares decisions.
Usage: python tools/test_pck.py [cpu|tpu] [n_configs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.ops import fkcc
from vamp_mvt_tpu.pointcloud import pipeline
from vamp_mvt_tpu.robots import registry
from tests.test_rrtc import CAGE

PROBLEM = {
    "problem": "cage",
    "sphere": [],
    "cylinder": [],
    "box": [
        {
            "position": c,
            "orientation_quat_xyzw": [0, 0, 0, 1],
            "orientation_euler_xyz": [0, 0, 0],
            "half_extents": [0.14, 0.14, 0.14],
        }
        for c in CAGE
    ],
}


def main():
    spec = registry.load("panda")
    b, orig, filt, f_ns, b_ns = pipeline.problem_to_pointcloud_env(
        "panda", PROBLEM, pc_repr="mvt", samples_per_object=3000,
        filter_type="scdf", kernel_pc=True,
    )
    env = b.build()
    print(f"points {len(filt)}  chunks {env.pck.chunks.shape[0]}  "
          f"bitmap {env.pck.bitmap.shape}  filter {f_ns/1e6:.2f}ms build {b_ns/1e6:.2f}ms")

    rng = np.random.default_rng(0)
    lo, hi = np.asarray(spec.limits_low), np.asarray(spec.limits_high)
    q = jnp.asarray(rng.uniform(lo, hi, (N, spec.dimension)).astype(np.float32))

    ok_xla = jax.jit(lambda q: fkcc.fkcc(spec, env, q, use_pallas=False))(q)
    interp = mode == "cpu"
    if interp:
        from vamp_mvt_tpu.ops.kernels import fkcc_pallas as fp
        # interpret-mode run of the kernel path
        import jax.experimental.pallas as pl  # noqa
        ok_k = fp.fkcc_hot(spec, env, q)
    else:
        ok_k = jax.jit(lambda q: fkcc.fkcc(spec, env, q, use_pallas=True))(q)
    a, bb = np.asarray(ok_xla), np.asarray(ok_k)
    n_mismatch = int((a != bb).sum())
    print(f"XLA valid {a.sum()}/{N}  kernel valid {bb.sum()}/{N}  mismatches {n_mismatch}")
    if n_mismatch:
        idx = np.flatnonzero(a != bb)[:5]
        print("first mismatch configs:", idx)
        sys.exit(1)

    if mode == "tpu":
        f = jax.jit(lambda q: fkcc.fkcc(spec, env, q, use_pallas=True))
        f(q).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(q)
        o.block_until_ready()
        el = (time.perf_counter() - t0) / 20
        print(f"kernel fkcc: {el*1e6:.0f} us for {N} configs = {el/N*1e9:.0f} ns/config")
        g = jax.jit(lambda q: fkcc.fkcc(spec, env, q, use_pallas=False))
        g(q).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            o = g(q)
        o.block_until_ready()
        el2 = (time.perf_counter() - t0) / 5
        print(f"XLA fkcc  : {el2*1e6:.0f} us = {el2/N*1e9:.0f} ns/config ({el2/el:.1f}x slower)")


if __name__ == "__main__":
    main()
