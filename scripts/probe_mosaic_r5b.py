"""Characterize the now-non-crashing dynamic_gather lowering: what shapes/
semantics does Mosaic actually support, and is it correct?"""
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def run(name, kernel, args, out_shape, expected):
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
        )(*args)
        ok = np.allclose(np.asarray(out), np.asarray(expected))
        print(f"{name}: ran, correct={ok}", flush=True)
        if not ok:
            print("  got     :", np.asarray(out)[:2, :6])
            print("  expected:", np.asarray(expected)[:2, :6])
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


# 1. take_along_axis within ONE vreg: (8,128) src, idx<8
src8 = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
idx8 = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 3) % 8
run(
    "taa (8,128) idx<8",
    lambda i, s, o: o.__setitem__(Ellipsis, jnp.take_along_axis(s[...], i[...], axis=0)),
    (idx8, src8),
    (8, 128),
    jnp.take_along_axis(src8, idx8, axis=0),
)

# 2. take_along_axis (32,128) src, idx<32 — cross-vreg
src32 = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
idx32 = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 7) % 32
run(
    "taa (32,128)->(8,128) idx<32",
    lambda i, s, o: o.__setitem__(Ellipsis, jnp.take_along_axis(s[...], i[...], axis=0)),
    (idx32, src32),
    (8, 128),
    jnp.take_along_axis(src32, idx32, axis=0),
)

# 3. same-shape (32,128) -> (32,128)
idx32f = (jnp.arange(32 * 128, dtype=jnp.int32).reshape(32, 128) * 5) % 32
run(
    "taa (32,128)->(32,128) idx<32",
    lambda i, s, o: o.__setitem__(Ellipsis, jnp.take_along_axis(s[...], i[...], axis=0)),
    (idx32f, src32),
    (32, 128),
    jnp.take_along_axis(src32, idx32f, axis=0),
)

# 4. gather along axis=1 (lanes): out[i,j] = src[i, idx[i,j]]
idxl = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 11) % 128
run(
    "taa axis=1 (8,128) idx<128",
    lambda i, s, o: o.__setitem__(Ellipsis, jnp.take_along_axis(s[...], i[...], axis=1)),
    (idxl, src8),
    (8, 128),
    jnp.take_along_axis(src8, idxl, axis=1),
)

# 5. axis=1 with bigger row count (256,128)
src256 = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
idxl256 = (jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128) * 13) % 128
run(
    "taa axis=1 (256,128) idx<128",
    lambda i, s, o: o.__setitem__(Ellipsis, jnp.take_along_axis(s[...], i[...], axis=1)),
    (idxl256, src256),
    (256, 128),
    jnp.take_along_axis(src256, idxl256, axis=1),
)

# 6. axis=1 with 256 lanes
src_l256 = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
idx_l256 = (jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256) * 13) % 256
run(
    "taa axis=1 (8,256) idx<256",
    lambda i, s, o: o.__setitem__(Ellipsis, jnp.take_along_axis(s[...], i[...], axis=1)),
    (idx_l256, src_l256),
    (8, 256),
    jnp.take_along_axis(src_l256, idx_l256, axis=1),
)
