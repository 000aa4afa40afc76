"""Feasibility probes for the planner megakernel: which Mosaic constructs work.

Rule discovered in v1: scalar stores must target SMEM refs, never VMEM.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    print(f"running {name}...", flush=True)
    def deco(f):
        try:
            f()
            print(f"OK   {name}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
    return deco


@probe("while_loop scalar carry + VMEM row writes + SMEM scalar out")
def _():
    def kernel(x_ref, o_ref, s_ref):
        def cond(c):
            i, acc = c
            return (i < 10) & (acc < 100.0)

        def body(c):
            i, acc = c
            o_ref[0, :] = o_ref[0, :] + x_ref[0, :]
            return i + 1, acc + x_ref[0, 0]

        i, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0)))
        s_ref[0] = acc

    x = jnp.ones((8, 128), jnp.float32)
    out, s = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(x)
    assert float(s[0]) == 10.0, float(s[0])


@probe("dynamic sublane write + dynamic scalar read from VMEM -> SMEM")
def _():
    def kernel(x_ref, o_ref, s_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        idx = jnp.int32(x_ref[0, 0])  # scalar read from VMEM
        o_ref[pl.ds(idx, 1), :] = x_ref[pl.ds(0, 1), :] * 2.0
        s_ref[0] = o_ref[idx, 5]  # scalar read at dynamic index

    x = jnp.full((16, 128), 3.0, jnp.float32)
    out, s = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((16, 128), jnp.float32),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(x)
    assert float(out[3, 5]) == 6.0
    assert float(s[0]) == 6.0


@probe("SMEM scratch array, 512 scalar writes in fori")
def _():
    def kernel(o_ref, smem):
        def body(i, _):
            smem[i] = i * 2
            return 0

        jax.lax.fori_loop(0, 512, body, 0)
        o_ref[0] = smem[511] + smem[3]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((512,), jnp.int32)],
    )()
    assert int(out[0]) == 1022 + 6


@probe("matmul (512x8)@(8,64)->(512,64) + sublane argmin -> VMEM row")
def _():
    def kernel(a_ref, b_ref, o_ref):
        d2 = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
        mn = jnp.min(d2, axis=0, keepdims=True)  # (1, 64)
        rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        idx = jnp.min(jnp.where(d2 <= mn, rows, 10**9), axis=0, keepdims=True)
        o_ref[pl.ds(0, 1), :] = idx.astype(jnp.float32)

    a = jnp.asarray(np.random.randn(512, 8), jnp.float32)
    b = jnp.asarray(np.random.randn(8, 64), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    want = np.argmin(np.asarray(a) @ np.asarray(b), axis=0)
    got = np.asarray(out[0]).astype(int)
    assert (got == want).all(), (got[:8], want[:8])


@probe("while_loop containing fori_loop + dynamic sublane writes (nested)")
def _():
    def kernel(o_ref, s_ref, smem):
        o_ref[:] = jnp.zeros_like(o_ref)

        def cond(c):
            return c < 5

        def body(c):
            def inner(i, _):
                smem[0] = smem[0] + 1
                return 0

            jax.lax.fori_loop(0, 3, inner, 0)
            o_ref[pl.ds(c, 1), :] = jnp.full((1, 128), c, jnp.float32)
            return c + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))
        s_ref[0] = smem[0]

    out, s = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
    )()
    assert float(out[4, 3]) == 4.0
    assert int(s[0]) == 15


@probe("grid: per-problem (1,8) SMEM in/out + VMEM scratch persists across steps")
def _():
    def kernel(s_in, o_ref, state, acc_smem):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            acc_smem[0] = jnp.int32(0)

        acc_smem[0] = acc_smem[0] + s_in[0, 0]
        o_ref[0, 0] = acc_smem[0]

    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, 8), lambda b: (b, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 8), lambda b: (b, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32), pltpu.SMEM((4,), jnp.int32)],
    )(jnp.broadcast_to(jnp.arange(1, 5, dtype=jnp.int32)[:, None], (4, 8)))
    assert list(np.asarray(out[:, 0])) == [1, 3, 6, 10], np.asarray(out)


@probe("cross-lane group-of-32 reduce via (128,4) matmul")
def _():
    def kernel(x_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 4), 0)
        groups = jax.lax.broadcasted_iota(jnp.int32, (128, 4), 1)
        W = (lanes // 32 == groups).astype(jnp.float32)
        sums = jnp.dot(x_ref[:], W, preferred_element_type=jnp.float32)  # (8, 4)
        o_ref[:, :] = sums

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert float(out[2, 3]) == 32.0


@probe("scalar read of computed VMEM value via scratch roundtrip")
def _():
    def kernel(x_ref, o_ref, vscr):
        vscr[:, :] = x_ref[:] * 3.0
        total = jnp.int32(0)

        def body(i, t):
            return t + jnp.int32(vscr[i, i])

        total = jax.lax.fori_loop(0, 8, body, total)
        o_ref[0] = total

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)
    assert int(out[0]) == 24


print("probes done")
