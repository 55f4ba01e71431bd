"""mmcv-style string registry (reference `src/utils/registry.py:10,68`).

Maps a ``type`` key in a config dict to a registered class/function, used by
the optimizer and LR-scheduler builders so that configs like
``{"type": "AdamW", "lr": 5e-5}`` stay identical to the reference's.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable


class Registry:
    def __init__(self, name: str, parent: "Registry | None" = None):
        self._name = name
        self._module_dict: dict[str, Any] = {}
        self._children: dict[str, Registry] = {}
        self.parent = parent
        if parent is not None:
            parent._children[name] = self

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __repr__(self) -> str:
        return f"Registry(name={self._name}, items={list(self._module_dict)})"

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> dict:
        return self._module_dict

    def get(self, key: str):
        if key in self._module_dict:
            return self._module_dict[key]
        if self.parent is not None:
            return self.parent.get(key)
        return None

    def _register_module(self, module, module_name=None, force=False):
        if module_name is None:
            module_name = module.__name__
        names = [module_name] if isinstance(module_name, str) else list(module_name)
        for name in names:
            if not force and name in self._module_dict:
                raise KeyError(f"{name} is already registered in {self._name}")
            self._module_dict[name] = module
        return module

    def register_module(self, name=None, force=False, module=None):
        if module is not None:
            return self._register_module(module, name, force)

        def _register(mod):
            return self._register_module(mod, name, force)

        return _register

    def build(self, cfg: dict, **default_args):
        return build_from_cfg(cfg, self, default_args or None)


def build_from_cfg(cfg: dict, registry: Registry, default_args: dict | None = None):
    """Build an object from a ``{"type": ..., **kwargs}`` config dict."""
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise KeyError(f"cfg must be a dict containing 'type', got {cfg!r}")
    args = dict(cfg)
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not in the {registry.name} registry")
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be str or class, got {type(obj_type)}")
    return obj_cls(**args)
