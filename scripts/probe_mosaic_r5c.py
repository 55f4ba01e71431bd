"""Round-5 probe set C: the exact Mosaic primitives the fused token-builder
kernel needs (see PERF.md round-5 plan). Each probe is minimal and checked
for correctness, not speed.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def check(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'OK' if ok else 'WRONG VALUES'}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


# 1. bf16 take_along_axis axis=1, (512,128) src, idx broadcast from (1,128)
def p1():
    src = jnp.asarray(np.random.RandomState(0).randn(512, 128), jnp.bfloat16)
    idx1 = jnp.asarray((np.arange(128) * 37) % 128, jnp.int32)[None]  # (1,128)

    def k(i_ref, s_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[...], (512, 128))
        o_ref[...] = jnp.take_along_axis(s_ref[...], idx, axis=1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.bfloat16)
    )(idx1, src)
    exp = jnp.take_along_axis(src, jnp.broadcast_to(idx1, (512, 128)), axis=1)
    return jnp.array_equal(out, exp)


# 2. f32 taa (512,128) with (1,128)-broadcast idx
def p2():
    src = jnp.asarray(np.random.RandomState(1).randn(512, 128), jnp.float32)
    idx1 = jnp.asarray((np.arange(128) * 53) % 128, jnp.int32)[None]

    def k(i_ref, s_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[...], (512, 128))
        o_ref[...] = jnp.take_along_axis(s_ref[...], idx, axis=1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32)
    )(idx1, src)
    exp = jnp.take_along_axis(src, jnp.broadcast_to(idx1, (512, 128)), axis=1)
    return jnp.array_equal(out, exp)


# 3. while_loop: scalar carry from vector min-reduce; scratch mutation;
#    dynamic leading-dim read of a 3-D ref at the carried scalar
def p3():
    C, D = 6, 64
    g = jnp.asarray(
        np.random.RandomState(2).randn(C, D, 128), jnp.float32
    )
    # chunks to visit: 1, 3, 4 (as min over a chunk-state vector)
    chunk0 = jnp.asarray(
        np.array([3, 1, 4, 1, 3, 4, 1, 3] * 16, np.int32).reshape(1, 128)
    )
    BIG = 10**9

    def k(ch_ref, g_ref, o_ref, acc_ref, st_ref):
        st_ref[...] = ch_ref[...]
        acc_ref[...] = jnp.zeros((D, 128), jnp.float32)

        def cond(c):
            return c < BIG

        def body(c):
            win = g_ref[c]  # (D, 128) dynamic leading index
            acc_ref[...] = acc_ref[...] + win
            st = st_ref[...]
            st_ref[...] = jnp.where(st == c, BIG, st)
            return jnp.min(st_ref[...])

        c0 = jnp.min(st_ref[...])
        jax.lax.while_loop(cond, body, c0)
        o_ref[...] = acc_ref[...]

    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
    )(chunk0, g)
    exp = g[1] + g[3] + g[4]
    return jnp.allclose(out, exp)


# 4. dot((16,128),(512,128)) contracting lanes, bf16 inputs, f32 out
def p4():
    a = jnp.asarray(np.random.RandomState(3).randn(16, 128), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(4).randn(512, 128), jnp.bfloat16)

    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32)
    )(a, b)
    exp = jnp.einsum(
        "ik,jk->ij", a.astype(jnp.float32), b.astype(jnp.float32)
    )
    return jnp.allclose(out, exp, atol=0.5, rtol=0.05)


# 5. int32 elementwise shift/and over (512,128) + bitmap build
def p5():
    x = jnp.asarray(
        np.random.RandomState(5).randint(0, 2**30, (512, 128)), jnp.int32
    )

    def k(x_ref, o_ref):
        v = x_ref[...]
        bit3 = (v >> 3) & 1
        o_ref[...] = bit3 + ((v >> 7) & 1) * 2

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32)
    )(x)
    exp = ((x >> 3) & 1) + ((x >> 7) & 1) * 2
    return jnp.array_equal(out, exp)


# 6. where with (1,128) pred broadcast over (512,128) bf16
def p6():
    x = jnp.asarray(np.random.RandomState(6).randn(512, 128), jnp.bfloat16)
    p = jnp.asarray(np.arange(128) % 3 == 0).reshape(1, 128)

    def k(p_ref, x_ref, o_ref):
        o_ref[...] = jnp.where(p_ref[...], x_ref[...], jnp.bfloat16(-1.0))

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.bfloat16)
    )(p, x)
    exp = jnp.where(p, x, jnp.bfloat16(-1.0))
    return jnp.array_equal(out, exp)


# 7. grid accumulation: constant-index output block summed over a 2-D grid
#    while an input block revisits (indexed by the outer grid dim only)
def p7():
    B, T, D = 3, 4, 64
    x = jnp.asarray(np.random.RandomState(7).randn(B, T * D, 128), jnp.float32)

    def k(x_ref, o_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((b == 0) & (t == 0))
        def _():
            o_ref[...] = jnp.zeros((D, 128), jnp.float32)

        o_ref[...] = o_ref[...] + x_ref[0, pl.ds(t * D, D), :]

    out = pl.pallas_call(
        k,
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, T * D, 128), lambda b, t: (b, 0, 0))],
        out_specs=pl.BlockSpec((D, 128), lambda b, t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
    )(x)
    exp = x.reshape(B, T, D, 128).sum(axis=(0, 1))
    return jnp.allclose(out, exp, atol=1e-4)


# 8. pl.ds(c, 2) leading-dim window (cpv=2) with c from a reduce
def p8():
    C, D = 6, 64
    g = jnp.asarray(np.random.RandomState(8).randn(C, D, 128), jnp.float32)
    sel = jnp.asarray(np.full((1, 128), 2, np.int32))

    def k(s_ref, g_ref, o_ref):
        c = jnp.min(s_ref[...])
        win = g_ref[pl.ds(c, 2)]  # (2, D, 128)
        o_ref[...] = win[0] + win[1]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32)
    )(sel, g)
    return jnp.allclose(out, g[2] + g[3])


for name, fn in [
    ("1 bf16 taa (512,128) bcast idx", p1),
    ("2 f32 taa (512,128) bcast idx", p2),
    ("3 while_loop + scratch + dyn lead idx", p3),
    ("4 dot contract-lanes (16,128)x(512,128)", p4),
    ("5 int32 shifts (512,128)", p5),
    ("6 where (1,128) pred bcast", p6),
    ("7 grid-accumulated const output", p7),
    ("8 pl.ds(c,2) leading window", p8),
]:
    check(name, fn)
