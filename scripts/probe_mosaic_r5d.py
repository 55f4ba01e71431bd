"""Round-5 probe set D: bf16-pair packing for the fused token builder.

Question: can the kernel gather f32 lanes that are really packed bf16 pairs,
then reinterpret them as a bf16 tile with twice the sublanes — and which
packing order (which two bf16 channels share one f32 word) makes that
reinterpretation value-correct?
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def check(name, fn):
    try:
        out = fn()
        print(f"{name}: {out}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


Dp, L = 16, 128  # packed rows, lanes
D = 2 * Dp

rng = np.random.RandomState(0)
vals = np.round(rng.randn(D, L).astype(np.float32), 2).astype(jnp.bfloat16)


def pack(order):
    """order: 'adjacent' packs rows (2r, 2r+1); 'split' packs (r, r+Dp)."""
    v = np.asarray(vals, np.float32).astype(jnp.bfloat16)
    if order == "adjacent":
        pairs = np.asarray(v).reshape(Dp, 2, L).transpose(0, 2, 1)  # (Dp,L,2)
    else:
        pairs = np.stack(
            [np.asarray(v)[:Dp], np.asarray(v)[Dp:]], axis=-1
        )  # (Dp,L,2)
    packed = lax.bitcast_convert_type(
        jnp.asarray(pairs, jnp.bfloat16), jnp.float32
    )  # (Dp, L)
    return packed


def mk_probe(order):
    def fn():
        packed = pack(order)

        def k(p_ref, o_ref):
            x = p_ref[...]  # (Dp, L) f32 packed
            o_ref[...] = pltpu.bitcast(x, jnp.bfloat16)

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((D, L), jnp.bfloat16)
        )(packed)
        out = np.asarray(out, np.float32)
        ref = np.asarray(vals, np.float32)
        if np.array_equal(out, ref):
            return "MATCH"
        # try to describe the found permutation on the first lane
        return (
            f"ran, no match; out[:6,0]={out[:6, 0]} ref[:6,0]={ref[:6, 0]} "
            f"refsplit[:6,0]={np.concatenate([ref[::2], ref[1::2]])[:6, 0]}"
        )

    return fn


# 3. gather packed f32 then bitcast: end-to-end shape of the real kernel
def p_gather_bitcast(order):
    def fn():
        packed = pack(order)
        idx = jnp.asarray((np.arange(L) * 37) % L, jnp.int32)[None]

        def k(i_ref, p_ref, o_ref):
            rel = jnp.broadcast_to(i_ref[...], (Dp, L))
            got = jnp.take_along_axis(p_ref[...], rel, axis=1)
            o_ref[...] = pltpu.bitcast(got, jnp.bfloat16)

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((D, L), jnp.bfloat16)
        )(idx, packed)
        exp = np.asarray(vals, np.float32)[:, (np.arange(L) * 37) % L]
        return "MATCH" if np.array_equal(np.asarray(out, np.float32), exp) else "no match"

    return fn


check("bitcast f32->bf16 order=adjacent", mk_probe("adjacent"))
check("bitcast f32->bf16 order=split", mk_probe("split"))
check("gather+bitcast order=adjacent", p_gather_bitcast("adjacent"))
check("gather+bitcast order=split", p_gather_bitcast("split"))

# 4. XLA max-grad tie semantics (CPU/TPU check, plain jnp)
x = jnp.asarray([1.0, 3.0, 3.0, 2.0])
gmax = jax.grad(lambda v: jnp.max(v))(x)
print("jnp.max tie grad:", np.asarray(gmax), flush=True)
xw = jnp.asarray([[1.0, 3.0, 3.0, 2.0]])
g2 = jax.grad(lambda v: jnp.sum(jnp.max(v, axis=1)))(xw)
print("jnp.max axis tie grad:", np.asarray(g2), flush=True)
