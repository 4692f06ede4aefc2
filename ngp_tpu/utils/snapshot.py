"""Snapshot save/load: versioned msgpack, optionally zlib-compressed.

Follows the reference's snapshot design (``testbed.cu:4873-5057``): a
msgpack document with a ``"snapshot"`` section holding binary parameter
blobs plus metadata (training step, loss EMA, density grid, dataset info,
camera). ``.ingp`` files are zlib-compressed msgpack, ``.msgpack`` files are
raw — same extension switch as the reference (``testbed.cu:4928``).

Array leaves are encoded as ``{"__nd__": True, dtype, shape, data(bin)}`` so
arbitrary pytrees (params, optimizer state) round-trip exactly.
"""

from __future__ import annotations

import zlib
from typing import Any

import msgpack
import numpy as np

SNAPSHOT_FORMAT_VERSION = 1


def _encode(obj: Any) -> Any:
    import jax

    if isinstance(obj, (np.ndarray, np.generic)) or hasattr(obj, "__array__"):
        arr = np.asarray(obj)
        return {
            "__nd__": True,
            "dtype": arr.dtype.str,
            "shape": list(arr.shape),
            "data": arr.tobytes(),
        }
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_encode(v) for v in obj]
    return obj


def _decode(obj: Any) -> Any:
    if isinstance(obj, dict):
        if obj.get("__nd__"):
            return np.frombuffer(
                obj["data"], np.dtype(obj["dtype"])
            ).reshape(obj["shape"]).copy()
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj


def save_snapshot(path: str, payload: dict) -> None:
    doc = {"version": SNAPSHOT_FORMAT_VERSION, **_encode(payload)}
    raw = msgpack.packb(doc, use_bin_type=True)
    if path.endswith(".ingp"):
        raw = zlib.compress(raw)
    with open(path, "wb") as f:
        f.write(raw)


def load_snapshot(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read()
    if path.endswith(".ingp"):
        raw = zlib.decompress(raw)
    doc = msgpack.unpackb(raw, raw=False, strict_map_key=False)
    version = doc.get("version")
    if version is None or version > SNAPSHOT_FORMAT_VERSION:
        raise ValueError(f"unsupported snapshot version {version}")
    return _decode(doc)
