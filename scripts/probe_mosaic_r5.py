"""Round-5 re-probe of the two Mosaic toolchain blockers from round 4.

Blocker A: tpu.dynamic_gather — jnp.take / take_along_axis inside a Pallas
kernel crashed the axon remote Mosaic compile helper (HTTP 500) at any size.
Blocker B: a scalar extracted from a vector reduce (e.g. jnp.min(tile)) used
as a `pl.ds` start index — same HTTP-500 class.

If either now compiles+runs, the VMEM-resident fused token-builder kernel
(~45 ms/step prize) becomes buildable. See PERF.md.
"""
import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe_a_dynamic_gather():
    """jnp.take along rows inside a kernel (tiny size)."""

    def kernel(idx_ref, src_ref, out_ref):
        idx = idx_ref[...]  # (8,) int32
        src = src_ref[...]  # (32, 128) f32
        out_ref[...] = jnp.take(src, idx, axis=0)  # (8, 128)

    idx = jnp.arange(8, dtype=jnp.int32)[::-1] * 2
    src = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(idx, src)
    expected = jnp.take(src, idx, axis=0)
    assert jnp.allclose(out, expected), "wrong values"
    return "OK"


def probe_a2_take_along_axis():
    """take_along_axis variant (the kNN-gather shape class)."""

    def kernel(idx_ref, src_ref, out_ref):
        idx = idx_ref[...]  # (8, 128) int32 row indices
        src = src_ref[...]  # (32, 128) f32
        out_ref[...] = jnp.take_along_axis(src, idx, axis=0)

    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)) % 32
    src = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(idx, src)
    expected = jnp.take_along_axis(src, idx, axis=0)
    assert jnp.allclose(out, expected), "wrong values"
    return "OK"


def probe_b_reduce_scalar_ds():
    """jnp.min(tile) scalar as a pl.ds start index."""

    def kernel(src_ref, out_ref):
        anchor = jnp.min(src_ref[0, :]).astype(jnp.int32)  # vector reduce -> scalar
        out_ref[...] = src_ref[pl.ds(anchor, 8), :]

    src = jnp.broadcast_to(
        jnp.arange(128, dtype=jnp.float32)[None, :] * 0 + 4.0, (32, 128)
    ).astype(jnp.float32)
    src = src.at[0, :].set(4.0)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(src)
    assert out.shape == (8, 128)
    return "OK"


def main():
    results = {}
    for name, fn in [
        ("A.dynamic_gather(take)", probe_a_dynamic_gather),
        ("A2.take_along_axis", probe_a2_take_along_axis),
        ("B.reduce_scalar_pl_ds", probe_b_reduce_scalar_ds),
    ]:
        try:
            results[name] = fn()
        except Exception as e:
            tb = traceback.format_exc(limit=3)
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"{name}: {results[name]}", flush=True)
    return results


if __name__ == "__main__":
    main()
