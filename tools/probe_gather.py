"""Probe Mosaic per-lane gather constructs for the pointcloud fast path."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(f):
        try:
            ok = f()
            print(f"{name:<60} {'PASS' if ok else 'WRONG RESULT'}")
        except Exception as e:
            msg = str(e).replace("\n", " ")[:120]
            print(f"{name:<60} FAIL: {msg}")
    return deco


@probe("take_along_axis lanes: (8,128) idx into (8,128) table")
def _():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=1)

    t = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 128, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(t, idx)
    return np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(t), np.asarray(idx), 1))


@probe("take from (1,128) row broadcast: idx (8,128)")
def _():
    def kernel(t_ref, i_ref, o_ref):
        table = jnp.broadcast_to(t_ref[0:1, :], (8, 128))
        o_ref[:, :] = jnp.take_along_axis(table, i_ref[:, :], axis=1)

    t = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(t, idx)
    return np.array_equal(np.asarray(out), np.asarray(t)[0][np.asarray(idx)])


@probe("take_along_axis int32 table (bit words)")
def _():
    def kernel(t_ref, i_ref, o_ref):
        table = jnp.broadcast_to(t_ref[0:1, :], (8, 128))
        w = jnp.take_along_axis(table, i_ref[:, :] >> 5, axis=1)
        o_ref[:, :] = (w >> (i_ref[:, :] & 31)) & 1

    t = jnp.asarray(np.random.default_rng(2).integers(0, 2**31, (1, 128)), jnp.int32)
    idx = jnp.asarray(np.random.default_rng(3).integers(0, 128 * 32, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32)
    )(t, idx)
    exp = (np.asarray(t)[0][np.asarray(idx) >> 5] >> (np.asarray(idx) & 31)) & 1
    return np.array_equal(np.asarray(out), exp)


@probe("chained 2-level gather: (8,128) sublane-select then lane gather")
def _():
    # gather from a 16-row x 128-lane table: row select via 16-way select,
    # then lane gather
    def kernel(t_ref, ri_ref, li_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in range(16):
            row = jnp.broadcast_to(t_ref[r : r + 1, :], (8, 128))
            g = jnp.take_along_axis(row, li_ref[:, :], axis=1)
            acc = jnp.where(ri_ref[:, :] == r, g, acc)
        o_ref[:, :] = acc

    t = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    rng = np.random.default_rng(4)
    ri = jnp.asarray(rng.integers(0, 16, (8, 128)), jnp.int32)
    li = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(t, ri, li)
    exp = np.asarray(t)[np.asarray(ri), np.asarray(li)]
    return np.array_equal(np.asarray(out), exp)


@probe("take_along_axis sublanes: (8,128) idx into (8,128), axis=0")
def _():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=0)

    t = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(5).integers(0, 8, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(t, idx)
    return np.array_equal(
        np.asarray(out), np.take_along_axis(np.asarray(t), np.asarray(idx), 0)
    )


@probe("timing: 64 lane-gathers in one kernel")
def _():
    import time

    def kernel(t_ref, i_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        table = jnp.broadcast_to(t_ref[0:1, :], (8, 128))
        idx = i_ref[:, :]
        for k in range(64):
            acc = acc + jnp.take_along_axis(table, (idx + k) & 127, axis=1)
        o_ref[:, :] = acc

    t = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, (8, 128)), jnp.int32)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(t, i))
    f(t, idx).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(100):
        o = f(t, idx)
    o.block_until_ready()
    el = (time.perf_counter() - t0) / 100 / 64
    print(f"    per-gather cost ~{el*1e9:.0f} ns (incl dispatch amortized)")
    return True


if __name__ == "__main__":
    pass
