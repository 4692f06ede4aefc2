"""Reference-format ``.ingp`` / ``.msgpack`` snapshot interop.

The reference saves snapshots as msgpack of the full network-config JSON
with a ``"snapshot"`` key added (``Testbed::save_snapshot``,
``src/testbed.cu:4873-4937``); the ``.ingp`` extension wraps the msgpack in
a zlib stream (zstr, ``testbed.cu:4928-4934``). Inside ``snapshot``:

- ``params_binary`` (msgpack bin) + ``params_type`` (``"__half"``): the
  tcnn Trainer's flat parameter buffer.
- ``density_grid_binary``: fp16 density grid, ``128³·(max_cascade+1)``
  entries, **Morton-indexed** within each cascade
  (``cascaded_grid_idx_at``, ``src/testbed_nerf.cu:433-447``).
- ``training_step``, ``loss``, ``aabb``, camera state, dataset metadata
  (``json_binding.h:225-302``).

tcnn parameter layout for ``NerfNetwork`` (``set_params_impl``,
``include/neural-graphics-primitives/nerf_network.h:430-443``), in order:

1. density MLP, 2. rgb MLP, 3. position grid encoding, 4. dir encoding
   (SphericalHarmonics/Identity carry no params).

Each (FullyFused) MLP stores its weight matrices layer by layer, each
row-major ``[n_out, n_in]`` with the input width equal to the padded
output width of what feeds it and the final output width padded to the
network alignment (16); we map them to this package's bias-free
``x @ W (in, out)`` convention by transposition and row/column slicing.
The grid encoding stores levels consecutively, each level row-major
``(params_in_level, F)`` with ``params_in_level =
min(next_multiple(res³, 8), 2^log2_hashmap_size)`` — identical geometry to
``GridEncoding._level_geometry``.

Caveat: the tcnn submodule is not checked out in the reference snapshot,
so the MLP matrix orientation is reproduced from its usage sites and the
published tcnn API; the round-trip tests guarantee self-consistency, and
``params_from_reference``/``params_to_reference`` are each other's exact
inverses either way.
"""

from __future__ import annotations

import zlib

import msgpack
import numpy as np

SNAPSHOT_FORMAT_VERSION = 1  # testbed.cu:80
_ALIGN = 16  # FullyFusedMLP alignment (nerf_network.h:94-96)


def _next_multiple(x: int, m: int) -> int:
    return -(-x // m) * m


# -- container io


def load_ingp(path: str) -> dict:
    """Decode a reference snapshot file (zlib'd or raw msgpack) into a
    plain dict; msgpack bin fields come back as ``bytes``."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:2] != b"\x1f\x8b":  # zstr writes zlib, check magic loosely
        try:
            blob = zlib.decompress(blob)
        except zlib.error:
            pass  # raw msgpack (.msgpack extension path)
    else:  # gzip-wrapped zlib (zstr default)
        blob = zlib.decompress(blob, wbits=47)
    return msgpack.unpackb(blob, raw=False, strict_map_key=False)


def save_ingp(path: str, config: dict, compress: bool = True) -> None:
    """Encode ``config`` the way the reference writes it: msgpack, wrapped
    in a zlib stream when the extension is ``.ingp``."""
    blob = msgpack.packb(config, use_bin_type=True)
    if path.lower().endswith(".ingp"):
        blob = zlib.compress(blob, 6 if compress else 0)
    with open(path, "wb") as f:
        f.write(blob)


# -- parameter buffer <-> our param tree


def _mlp_padded_layout(n_input: int, n_neurons: int, n_hidden: int,
                       n_output: int):
    """tcnn layer shapes ``[(out, in), ...]`` with padded output width."""
    out_pad = _next_multiple(n_output, _ALIGN)
    if n_hidden == 0:
        return [(out_pad, n_input)]
    dims = [(n_neurons, n_input)]
    dims += [(n_neurons, n_neurons)] * (n_hidden - 1)
    dims += [(out_pad, n_neurons)]
    return dims


def _mlp_from_flat(flat: np.ndarray, off: int, mlp) -> tuple[dict, int]:
    """Parse one tcnn MLP's weights from ``flat`` at ``off`` into our
    ``{"weights": [(in, out), ...]}`` tree."""
    layout = _mlp_padded_layout(
        mlp.n_input_dims, mlp.n_neurons, mlp.n_hidden_layers, mlp.n_output_dims
    )
    ws = []
    for i, (rows, cols) in enumerate(layout):
        n = rows * cols
        m = flat[off:off + n].reshape(rows, cols).astype(np.float32)
        off += n
        w = m.T  # (in, out)
        if i == len(layout) - 1:
            w = w[:, : mlp.n_output_dims]  # drop padded output columns
        ws.append(w)
    return {"weights": ws}, off


def _mlp_to_flat(params: dict, mlp, dtype) -> list[np.ndarray]:
    layout = _mlp_padded_layout(
        mlp.n_input_dims, mlp.n_neurons, mlp.n_hidden_layers, mlp.n_output_dims
    )
    out = []
    ws = params["weights"]
    for i, (rows, cols) in enumerate(layout):
        w = np.asarray(ws[i], np.float32).T  # (out, in)
        if w.shape[0] < rows:  # pad output rows with zeros
            w = np.concatenate([w, np.zeros((rows - w.shape[0], cols), np.float32)], 0)
        assert w.shape == (rows, cols), (w.shape, rows, cols)
        out.append(w.astype(dtype).reshape(-1))
    return out


def _grid_from_flat(flat: np.ndarray, off: int, enc) -> tuple[dict, int]:
    _, _, sizes, _ = enc._level_geometry()
    F = enc.n_features_per_level
    table = np.zeros((enc.n_levels, enc.max_table_rows, F), np.float32)
    for l, size in enumerate(sizes):
        n = int(size) * F
        table[l, : int(size)] = flat[off:off + n].reshape(int(size), F)
        off += n
    return {"table": table}, off


def _grid_to_flat(params: dict, enc, dtype) -> list[np.ndarray]:
    _, _, sizes, _ = enc._level_geometry()
    F = enc.n_features_per_level
    table = np.asarray(params["table"], np.float32)
    return [
        table[l, : int(size)].astype(dtype).reshape(-1)
        for l, size in enumerate(sizes)
    ]


def reference_n_params(network) -> int:
    """Total tcnn parameter count for a ``NerfNetwork`` (with padding)."""
    total = 0
    for mlp in (network.density_mlp, network.rgb_mlp):
        total += sum(
            r * c
            for r, c in _mlp_padded_layout(
                mlp.n_input_dims, mlp.n_neurons, mlp.n_hidden_layers,
                mlp.n_output_dims,
            )
        )
    total += network.pos_encoding.n_params
    total += network.dir_encoding.n_params
    return total


def params_from_reference(snapshot: dict, network) -> dict:
    """``snapshot["params_binary"]`` → our ``NerfNetwork`` param tree."""
    ptype = snapshot.get("params_type", "__half")
    dtype = np.float16 if ptype == "__half" else np.float32
    flat = np.frombuffer(snapshot["params_binary"], dtype=dtype).astype(
        np.float32
    )
    expect = reference_n_params(network)
    if flat.size < expect:
        raise ValueError(
            f"snapshot has {flat.size} params; network needs {expect} "
            "(config mismatch?)"
        )
    if network.dir_encoding.n_params > 0:
        raise NotImplementedError(
            "reference snapshots with a parametric dir encoding are not "
            "supported (SH/Identity/Frequency carry no params)"
        )
    off = 0
    density, off = _mlp_from_flat(flat, off, network.density_mlp)
    rgb, off = _mlp_from_flat(flat, off, network.rgb_mlp)
    pos, off = _grid_from_flat(flat, off, network.pos_encoding)
    import jax

    return {
        "pos_encoding": pos,
        # param-free, but the composite's nested {} structure must match
        "dir_encoding": network.dir_encoding.init(jax.random.PRNGKey(0)),
        "density_mlp": density,
        "rgb_mlp": rgb,
    }


def params_to_reference(model_params: dict, network,
                        dtype=np.float16) -> bytes:
    """Our ``NerfNetwork`` param tree → tcnn flat parameter buffer."""
    chunks = []
    chunks += _mlp_to_flat(model_params["density_mlp"], network.density_mlp, dtype)
    chunks += _mlp_to_flat(model_params["rgb_mlp"], network.rgb_mlp, dtype)
    chunks += _grid_to_flat(model_params["pos_encoding"], network.pos_encoding, dtype)
    return np.concatenate(chunks).tobytes()


# -- density grid <-> morton order


def _morton_codes(G: int) -> np.ndarray:
    """Morton code of every cell in our row-major (x, y, z) order — tcnn
    ``morton3D`` (x in the least-significant interleaved bits)."""

    def expand(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    r = np.arange(G, dtype=np.uint64)
    x, y, z = np.meshgrid(r, r, r, indexing="ij")
    return (expand(x) | (expand(y) << np.uint64(1))
            | (expand(z) << np.uint64(2))).reshape(-1).astype(np.int64)


def density_grid_from_reference(blob: bytes, n_cascades: int,
                                grid_size: int = 128) -> np.ndarray:
    """fp16 Morton grid bytes → our ``(C, G, G, G)`` row-major float32."""
    g = np.frombuffer(blob, dtype=np.float16).astype(np.float32)
    n_cells = grid_size ** 3
    if g.size != n_cascades * n_cells:
        raise ValueError(
            f"density grid has {g.size} cells, expected "
            f"{n_cascades}x{n_cells}"
        )
    codes = _morton_codes(grid_size)
    out = np.empty((n_cascades, n_cells), np.float32)
    for c in range(n_cascades):
        out[c] = g[c * n_cells:][codes]
    return out.reshape(n_cascades, grid_size, grid_size, grid_size)


def density_grid_to_reference(density: np.ndarray) -> bytes:
    """Our ``(C, G, G, G)`` grid → fp16 Morton-ordered bytes."""
    C, G = density.shape[0], density.shape[1]
    codes = _morton_codes(G)
    out = np.empty((C, G ** 3), np.float16)
    flat = np.asarray(density, np.float32).reshape(C, -1)
    for c in range(C):
        out[c, codes] = flat[c]
    return out.tobytes()
