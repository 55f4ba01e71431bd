"""Process-index-aware logger (reference `src/utils/pylogger.py:10`).

The reference prefixes log lines with the DDP rank; here the rank is the JAX
process index (multi-host data parallelism), read lazily so importing this
module never initializes the backend.
"""

from __future__ import annotations

import logging
import sys


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class RankedLogger(logging.LoggerAdapter):
    """Logger adapter that prefixes the JAX process index on every record."""

    def __init__(self, name: str = __name__, rank_zero_only: bool = False, extra=None):
        logger = logging.getLogger(name)
        if not logger.handlers and not logging.getLogger().handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(
                logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] - %(message)s")
            )
            logger.addHandler(handler)
            logger.setLevel(logging.INFO)
        super().__init__(logger=logger, extra=extra)
        self.rank_zero_only = rank_zero_only

    def log(self, level, msg, *args, rank=None, **kwargs):
        if not self.isEnabledFor(level):
            return
        current_rank = _process_index()
        msg, kwargs = self.process(f"[rank: {current_rank}] {msg}", kwargs)
        if self.rank_zero_only or rank is not None:
            if current_rank == (0 if rank is None else rank):
                self.logger.log(level, msg, *args, **kwargs)
        else:
            self.logger.log(level, msg, *args, **kwargs)
