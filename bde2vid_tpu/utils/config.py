"""Unified config system.

The reference has three coexisting config systems (SURVEY §5.6): mutated
argparse namespaces, mmengine registries, and a json ``ConfigParser`` with
reflection instantiation + ``--flag target;path`` overrides
(parse_config.py:15-161). This module provides ONE json-based system with
the ConfigParser's useful surface:

- ``Config.from_json(path, overrides)`` with dotted/semicolon path overrides
- ``init_obj(cfg_section, registry_or_module, *args)`` reflection building
  (``{"type": Name, "args": {...}}``)
- run-directory creation with saved config (save_dir/log_dir, :29-52)
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Mapping, Optional, Sequence


def read_json(path: str) -> Dict:
    with open(path) as fp:
        return json.load(fp)


def write_json(content, path: str) -> None:
    with open(path, "w") as fp:
        json.dump(content, fp, indent=4, sort_keys=False)


def _set_by_path(tree: Dict, path: str, value):
    keys = path.replace(";", "/").replace(".", "/").split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get_by_path(tree: Mapping, path: str):
    node = tree
    for k in path.replace(";", "/").replace(".", "/").split("/"):
        node = node[k]
    return node


class Config:
    """A dict wrapper with path overrides and reflection instantiation."""

    def __init__(self, cfg: Dict, run_dir: Optional[str] = None):
        self.cfg = cfg
        self.run_dir = run_dir

    @classmethod
    def from_json(
        cls,
        path: str,
        overrides: Optional[Mapping[str, Any]] = None,
        make_run_dir: bool = False,
        save_root: str = "runs",
    ) -> "Config":
        cfg = read_json(path)
        for k, v in (overrides or {}).items():
            _set_by_path(cfg, k, v)
        run_dir = None
        if make_run_dir:
            name = cfg.get("name", os.path.splitext(os.path.basename(path))[0])
            stamp = time.strftime("%m%d_%H%M%S")
            run_dir = os.path.join(save_root, name, stamp)
            os.makedirs(run_dir, exist_ok=True)
            write_json(cfg, os.path.join(run_dir, "config.json"))
        return cls(cfg, run_dir)

    def __getitem__(self, key):
        return self.cfg[key]

    def get(self, key, default=None):
        return self.cfg.get(key, default)

    def by_path(self, path: str):
        return _get_by_path(self.cfg, path)

    def init_obj(self, section: str, registry, *args, **extra):
        """Instantiate ``cfg[section] = {"type": Name, "args": {...}}`` from a
        registry dict or a module namespace (reference init_obj :84-98)."""
        spec = self.cfg[section]
        name = spec["type"]
        kwargs = dict(spec.get("args", {}))
        overlap = set(kwargs) & set(extra)
        if overlap:
            raise ValueError(f"config/kwarg collision: {sorted(overlap)}")
        kwargs.update(extra)
        target = registry[name] if isinstance(registry, Mapping) else getattr(registry, name)
        return target(*args, **kwargs)
