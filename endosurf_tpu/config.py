"""YAML configuration system with recursive inheritance.

Behavior-compatible with the reference config loader
(/root/reference/src/trainer/utils.py:24-68): a config file may name a parent
via ``inherit_from``; parents load first and children deep-merge on top.
Inheritance chains are resolved relative to the repo root first, then relative
to the child file's directory, so configs can be launched from anywhere.
"""

from __future__ import annotations

import copy
import os
import os.path as osp
from typing import Any, Dict, Optional

import yaml


def deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into ``base`` (in place) and return it."""
    for key, value in override.items():
        if isinstance(value, dict):
            node = base.setdefault(key, {})
            if not isinstance(node, dict):
                base[key] = copy.deepcopy(value)
            else:
                deep_merge(node, value)
        else:
            base[key] = value
    return base


def _resolve_parent(path: str, child_dir: str) -> str:
    candidates = [path, osp.join(child_dir, path)]
    for cand in candidates:
        if osp.exists(cand):
            return cand
    raise FileNotFoundError(
        f"inherit_from target {path!r} not found (tried {candidates})")


def load_config(path: str, _seen: Optional[set] = None) -> Dict[str, Any]:
    """Load a YAML config, resolving ``inherit_from`` chains with deep-merge."""
    _seen = set() if _seen is None else _seen
    real = osp.realpath(path)
    if real in _seen:
        raise ValueError(f"circular inherit_from chain at {path}")
    _seen.add(real)

    with open(path, "r") as f:
        cfg_child = yaml.safe_load(f) or {}

    parent = cfg_child.pop("inherit_from", None)
    if parent is not None:
        parent_path = _resolve_parent(parent, osp.dirname(real))
        cfg = load_config(parent_path, _seen)
    else:
        cfg = {}
    deep_merge(cfg, cfg_child)
    return cfg


def save_config(cfg: Dict[str, Any], path: str) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def get(cfg: Dict[str, Any], dotted: str, default: Any = None) -> Any:
    """Fetch ``cfg["a"]["b"]`` via ``get(cfg, "a.b")`` with a default."""
    node: Any = cfg
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node
