"""Network-config JSON handling.

Mirrors the reference's config semantics (nlohmann-JSON configs under
``configs/<mode>/*.json`` with ``//`` comments and a ``"parent"`` inheritance
key — see reference ``src/testbed.cu:95-106`` for the parent-merge rule), so
the reference's shipped configs load unchanged.
"""

from __future__ import annotations

import copy
import json
import os
import re
from typing import Any

def _strip_comments(text: str) -> str:
    """Remove ``//`` line comments outside of string literals."""
    out, i, n, in_str = [], 0, len(text), False
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
            out.append(c)
        elif c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def loads_jsonc(text: str) -> dict:
    """Parse JSON-with-comments (``//`` comments, as used by the reference's
    configs, e.g. ``configs/image/base.json``, ``configs/nerf/densegrid.json``)."""
    return json.loads(_strip_comments(text))


def load_config(path: str) -> dict:
    """Load a network config, resolving ``"parent"`` inheritance.

    Matches reference ``merge_parent_network_config`` (``src/testbed.cu:95-106``):
    the parent is loaded first and the child's keys are overlaid on top
    (shallow update at the top level, like ``nlohmann::json::update``).
    """
    with open(path) as f:
        cfg = loads_jsonc(f.read())
    if "parent" in cfg:
        parent_path = os.path.join(os.path.dirname(path), cfg.pop("parent"))
        parent = load_config(parent_path)
        parent.update(cfg)
        cfg = parent
    return cfg


def merge(base: dict, override: dict) -> dict:
    """Recursive dict merge (override wins); used for programmatic overrides."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def get(cfg: dict, key: str, default: Any) -> Any:
    """tcnn-style ``config.value(key, default)`` lookup."""
    v = cfg.get(key, default)
    return v
