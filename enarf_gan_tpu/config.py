"""Two-file YAML config system.

Same semantics as the reference config loader (reference: libraries/config.py:5-20):
a fully-populated default YAML plus a sparse override YAML, merged recursively
leaf-wise (override wins), exposed as an attribute-access dict. ``resume_latest``
and ``num_workers`` are injected the same way so the reference's configs work
unchanged.
"""
from __future__ import annotations

import copy
from typing import Any, Mapping, Optional

import yaml


class AttrDict(dict):
    """Attribute-access dict (stand-in for easydict, which is not vendored)."""

    def __init__(self, d: Optional[Mapping[str, Any]] = None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        merged = dict(d)
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, Mapping) and not isinstance(v, AttrDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, key, value):
        super().__setitem__(key, self._wrap(value))

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, AttrDict):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(x.to_dict() if isinstance(x, AttrDict) else x for x in v)
            else:
                out[k] = v
        return out


def merge_config(override: Mapping, default: Mapping) -> AttrDict:
    """Recursively merge ``override`` into ``default`` (leaf-wise overwrite).

    Matches reference libraries/config.py:9-16: a key whose default value is a
    dict is descended into; any other key is replaced wholesale.
    """
    result = AttrDict(copy.deepcopy(dict(default)))
    for key, value in override.items():
        if key in result and isinstance(result[key], AttrDict) and isinstance(value, Mapping):
            result[key] = merge_config(value, result[key])
        else:
            result[key] = value
    return result


def yaml_config(config: str, default_config: str, resume_latest: bool = False,
                num_workers: int = 1) -> AttrDict:
    """Load default + override YAML files and merge (reference libraries/config.py:5-20)."""
    with open(default_config) as f:
        default = yaml.safe_load(f) or {}
    with open(config) as f:
        conf = yaml.safe_load(f) or {}
    merged = merge_config(conf, default)
    merged["resume_latest"] = resume_latest
    if "dataset" in merged and isinstance(merged["dataset"], AttrDict):
        merged["dataset"]["num_workers"] = num_workers
    return merged
