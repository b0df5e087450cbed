"""Config system: typed registry replacing string-driven dynamic imports.

The reference wires its object graph through
`dnnlib.util.construct_class_by_name` (string class paths inside an
EasyDict tree, `/root/reference/g_nerf/dnnlib/util.py:238-307`). Here the
same late-binding is a plain registry of dataclass constructors — no
dynamic imports, jit-safe static configs, and checkpoints store the config
dict verbatim (rendering options stay serialized with the model, matching
the reference's rendering_kwargs-on-G behavior)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping


class EasyDict(dict):
    """Attribute-access dict (API parity with reference dnnlib.EasyDict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        _REGISTRY[cls.__name__] = cls
        return cls

    return deco


def construct(class_name: str, /, **kwargs) -> Any:
    """Instantiate a registered class by (possibly dotted reference-style)
    name — drop-in for `construct_class_by_name`."""
    short = class_name.split(".")[-1]
    if short not in _REGISTRY:
        raise KeyError(f"{class_name!r} not registered; known: {sorted(set(_REGISTRY))}")
    return _REGISTRY[short](**kwargs)


def asdict_shallow(cfg: Any) -> dict:
    if dataclasses.is_dataclass(cfg):
        return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    return dict(cfg)
