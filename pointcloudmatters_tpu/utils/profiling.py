"""Profiling hooks (reference SURVEY §5.1 TPU equivalent).

The reference exposes Lightning's ``trainer.profiler: simple`` via
``debug=profiler`` (`configs/debug/profiler.yaml:8-11`). Here ``profiler:
"jax"`` on the Trainer wraps the fit loop in a ``jax.profiler`` trace whose
artifacts open in TensorBoard / Perfetto, plus per-device memory stats.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from pointcloudmatters_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


class JaxProfiler:
    def __init__(self, log_dir: str):
        self.log_dir = os.path.join(log_dir, "jax_trace")
        self._active = False

    def start(self) -> None:
        os.makedirs(self.log_dir, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        self._active = True
        log.info(f"jax profiler trace -> {self.log_dir}")

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            log.info(f"jax profiler trace saved to {self.log_dir}")


def device_memory_stats() -> dict:
    stats = {}
    for d in jax.local_devices():
        mem = getattr(d, "memory_stats", lambda: None)()
        if mem:
            stats[f"device{d.id}"] = {
                "bytes_in_use": mem.get("bytes_in_use"),
                "peak_bytes_in_use": mem.get("peak_bytes_in_use"),
                "bytes_limit": mem.get("bytes_limit"),
            }
    return stats


def make_profiler(kind: Optional[str], log_dir: str):
    if kind in (None, False, "", "none"):
        return None
    if kind in ("jax", "simple", "advanced", "pytorch", True):
        return JaxProfiler(log_dir)
    raise ValueError(f"unknown profiler {kind!r}")
