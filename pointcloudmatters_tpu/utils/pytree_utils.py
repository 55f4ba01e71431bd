"""Small pytree helpers (reference `src/utils/pytorch_utils.py:8-47`)."""

from __future__ import annotations

from typing import Callable


def dict_apply(d: dict, fn: Callable) -> dict:
    """Apply ``fn`` to every non-dict value, recursing into sub-dicts
    (reference ``dict_apply``)."""
    out = {}
    for k, v in d.items():
        out[k] = dict_apply(v, fn) if isinstance(v, dict) else fn(v)
    return out


def dict_apply_split(d: dict, split_fn: Callable) -> dict:
    """Split each value into named parts: ``split_fn(v) -> {name: part}``;
    returns ``{name: {key: part}}``."""
    results: dict = {}
    for key, value in d.items():
        for name, part in split_fn(value).items():
            results.setdefault(name, {})[key] = part
    return results


def dict_apply_reduce(dicts: list, reduce_fn: Callable) -> dict:
    """Reduce a list of dicts key-wise."""
    return {
        key: reduce_fn([d[key] for d in dicts]) for key in dicts[0].keys()
    }
