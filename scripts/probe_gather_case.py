"""Probe ONE same-shape dynamic-gather case inside a Pallas kernel.
Usage: probe_gather_case.py ROWS COLS AXIS [DTYPE]"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

R, C, axis = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
dtype = jnp.dtype(sys.argv[4]) if len(sys.argv) > 4 else jnp.float32

rng = np.random.RandomState(0)
src = jnp.asarray(rng.randn(R, C), dtype)
if axis == 0:
    idx = jnp.asarray(rng.randint(0, R, (R, C)), jnp.int32)
else:
    idx = jnp.asarray(rng.randint(0, C, (R, C)), jnp.int32)


def kernel(idx_ref, src_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=axis)


t = time.time()
out = pl.pallas_call(
    kernel, out_shape=jax.ShapeDtypeStruct((R, C), dtype)
)(idx, src)
out.block_until_ready()
compile_t = time.time() - t
exp = jnp.take_along_axis(src, idx, axis=axis)
ok = np.array_equal(np.asarray(out), np.asarray(exp))
print(f"({R},{C}) axis={axis} {dtype}: correct={ok} compile={compile_t:.1f}s")
if not ok:
    print("  got", np.asarray(out)[:2, :4], "exp", np.asarray(exp)[:2, :4])
