"""Second round of megakernel probes: reductions-to-scalar, int ops, cumsum."""

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
            print(f"OK   {name}", flush=True)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)

    return deco


@probe("full reduction -> scalar arithmetic -> SMEM store + while carry")
def _():
    def kernel(x_ref, s_ref):
        total = jnp.sum(x_ref[:])          # (8,128) -> scalar
        mx = jnp.max(x_ref[0, :])          # row -> scalar
        n = jnp.int32(total) + jnp.int32(mx) * 2

        def body(c):
            return c + n

        out = jax.lax.while_loop(lambda c: c < 10 * n, body, jnp.int32(0))
        s_ref[0] = out

    x = jnp.ones((8, 128), jnp.float32)
    s = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x)
    n = 1024 + 2
    assert int(s[0]) == ((10 * n + n - 1) // n) * n, int(s[0])


@probe("i32 vector % and // by constants (halton digit loop)")
def _():
    def kernel(o_ref):
        idx = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0) + 1000
        i = idx
        n = jnp.zeros_like(idx)
        for _ in range(8):
            n = n * 3 + i % 3
            i = i // 3
        o_ref[:, :] = (n.astype(jnp.float32) * (1.0 / 3**8)) * jnp.ones((64, 128), jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )()
    # check vs numpy radical inverse
    def rad(k):
        i, nn = k, 0
        for _ in range(8):
            nn = nn * 3 + i % 3
            i //= 3
        return np.float32(nn) / 3**8

    got = np.asarray(out[:, 0])
    want = np.array([rad(k + 1000) for k in range(64)], np.float32)
    assert np.allclose(got, want), (got[:4], want[:4])


@probe("lane cumsum via roll+mask, first-true index to scalar")
def _():
    def kernel(x_ref, s_ref, o_ref):
        v = x_ref[0:1, :]  # (1, 128) of 0/1
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc = v
        for sh in (1, 2, 4, 8, 16, 32, 64):
            acc = acc + jnp.where(lanes >= sh, pltpu.roll(acc, sh, 1), 0.0)
        o_ref[0:1, :] = acc
        nth = (v > 0) & (acc == 3.0)  # third accepted
        first = jnp.min(jnp.where(nth, lanes, 10**9))
        s_ref[0] = first

    x = np.zeros((8, 128), np.float32)
    x[0, [5, 17, 40, 90]] = 1.0
    out_s, out_v = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8,), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray(x))
    assert int(out_s[0]) == 40, int(out_s[0])
    assert float(out_v[0, 127]) == 4.0


@probe("row<->col transpose via diag mask trick")
def _():
    def kernel(x_ref, o_ref):
        row = x_ref[0:1, :64]  # (1, 64)
        s_i = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
        l_i = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
        col = jnp.sum(jnp.where(s_i == l_i, jnp.broadcast_to(row, (64, 64)), 0.0), axis=1, keepdims=True)  # (64,1)
        o_ref[:, 0:1] = col

    x = jnp.asarray(np.arange(128, dtype=np.float32)[None].repeat(8, 0))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert list(np.asarray(out[:, 0])[:5]) == [0, 1, 2, 3, 4]


@probe("store computed (8,128) to scratch, static scalar reads back")
def _():
    def kernel(x_ref, s_ref, scr):
        scr[:, :] = x_ref[:] * 2.0
        s_ref[0] = jnp.int32(scr[3, 5])
        s_ref[1] = jnp.int32(scr[7, 127])

    x = jnp.full((8, 128), 21.0, jnp.float32)
    s = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)
    assert int(s[0]) == 42 and int(s[1]) == 42


@probe("dynamic sublane row read -> vector math -> dynamic row write, in while")
def _():
    def kernel(x_ref, o_ref, s_ref):
        o_ref[:, :] = jnp.zeros_like(o_ref)
        o_ref[pl.ds(0, 1), :] = x_ref[pl.ds(0, 1), :]

        def body(c):
            i, n = c
            row = o_ref[pl.ds(n - 1, 1), :]          # dynamic read (1, 128)
            o_ref[pl.ds(n, 1), :] = row + 1.0        # dynamic write
            return i + 1, n + 1

        _, n = jax.lax.while_loop(lambda c: c[0] < 10, body, (jnp.int32(0), jnp.int32(1)))
        s_ref[0] = n

    x = jnp.zeros((16, 128), jnp.float32)
    out, s = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((16, 128), jnp.float32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(x)
    assert float(out[10, 0]) == 10.0 and int(s[0]) == 11


@probe("(B,1,M) SMEM int output block, written in scalar loop")
def _():
    def kernel(o_ref):
        def body(i, _):
            o_ref[0, 0, i] = i * 3
            return 0

        jax.lax.fori_loop(0, 512, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(2,),
        out_specs=pl.BlockSpec((1, 1, 512), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((2, 1, 512), jnp.int32),
    )()
    assert int(out[1, 0, 511]) == 1533


print("probes done")
