"""Timing helpers for the tunneled TPU.

The axon tunnel has two traps: ``block_until_ready`` returns before remote
execution finishes, and every host fetch pays a ~200 ms round trip (plus
bandwidth for large arrays). Reliable timing = queue N dependent-or-serial
executes, fetch ONE tiny scalar from the last result, subtract the measured
round-trip floor.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

_FLOOR_CACHE: dict = {}


def rpc_floor() -> float:
    """Measured seconds for a trivial execute + tiny fetch."""
    if "floor" not in _FLOOR_CACHE:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros(())
        float(f(x))  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            x = f(x)
        float(x)
        _FLOOR_CACHE["floor"] = (time.perf_counter() - t0) / reps
    return _FLOOR_CACHE["floor"]


def _tiny(out):
    leaf = jax.tree.leaves(out)[0]
    flat = leaf.reshape(-1)[:1]
    return float(flat[0])


def time_op(fn, *args, n: int = 10, label: str = "") -> float:
    """Milliseconds per execution of ``fn(*args)`` (compute only)."""
    out = fn(*args)
    _tiny(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _tiny(out)
    total = time.perf_counter() - t0
    ms = max(total - rpc_floor(), 0.0) / n * 1000
    if label:
        print(f"{label}: {ms:.2f} ms")
    return ms
