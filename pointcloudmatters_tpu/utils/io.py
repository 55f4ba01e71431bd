"""IO helpers (reference `src/utils/io.py`): json / h5 / pickle / npy."""

from __future__ import annotations

import json
import pickle

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_json(obj, path: str, **kwargs):
    with open(path, "w") as f:
        json.dump(obj, f, **kwargs)


def load_h5_data(data) -> dict:
    """Recursively materialize an h5py group into nested numpy dicts
    (reference `src/utils/io.py:81-88`)."""
    out = {}
    for k in data.keys():
        if isinstance(data[k], h5py.Dataset):
            out[k] = data[k][:]
        else:
            out[k] = load_h5_data(data[k])
    return out


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(obj, path: str):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_npy(path: str, allow_pickle: bool = True):
    return np.load(path, allow_pickle=allow_pickle)


def save_npz_dict(path: str, tree: dict) -> None:
    """Save a (possibly nested) dict of arrays as a flat npz with '/'-joined keys."""
    flat = {}

    def _walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    _walk("", tree)
    np.savez(path, **flat)


def load_npz_dict(path: str) -> dict:
    """Inverse of :func:`save_npz_dict`."""
    out: dict = {}
    with np.load(path, allow_pickle=False) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return out


def load_numpy_pickle(path: str):
    """Load an object saved via ``np.save`` with pickling (the RLBench
    preprocessing format, reference `src/utils/io.py` analog)."""
    obj = np.load(path, allow_pickle=True)
    if isinstance(obj, np.ndarray) and obj.dtype == object:
        return obj.item()
    return obj


def listdir(path: str):
    import os

    return sorted(os.listdir(path))
