"""Pallas TPU kernel for the multiresolution hash-grid encoding forward.

Why: XLA lowers the encoding's 33.5M random 8-byte table reads per batch to
HBM gathers that cost ~200 ms on v5e (DRAM-burst waste dominates — each
8-byte row drags a full burst). This kernel instead keeps one level's table
**resident in VMEM** (≤4 MB at T=2^19·F=2 in bf16) and performs the random
access on-chip with Mosaic's ``tpu.dynamic_gather`` in two steps:

1. **row gather** (``take_along_axis`` axis=0): each of the tile's 2^13
   output slots pulls a full 128-lane table row — the row index is
   broadcast across lanes;
2. **lane select** (``take_along_axis`` axis=1): picks the F feature lanes
   of the addressed entry out of the fetched row.

The hash math (corner coords, XOR-prime spatial hash, trilinear weights —
reference semantics, ``tiny-cuda-nn`` grid encoding / SURVEY.md §2.10) runs
on the VPU inside the kernel, so HBM traffic is just positions in +
features out.

Table layout: level ``l``'s entry ``h``, feature ``f`` lives at row
``h // (128/F)``, lane ``F·(h % (128/F)) + f`` of a ``(L·R, 128)`` array,
``R = T·F/128``. ``pack_table`` / ``unpack_table`` convert from the
reference-shaped ``(L, T, F)`` parameter array.

Supported: Hash and Dense grid types (hashed levels have power-of-two
size = T so the mod is a mask; dense levels clamp corner coords instead of
wrapping — a measure-zero boundary deviation). Tiled falls back to the XLA
path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HASH_PRIMES = (1, 2654435761, 805459861)
LANES = 128
TILE = 8192  # sample-block rows; must equal the packed table's row count


def packed_rows(table_size: int, n_features: int) -> int:
    return table_size * n_features // LANES


def pack_table(table: jax.Array) -> jax.Array:
    """(L, T, F) → (L·TILE, 128) f32 kernel layout (feature-interleaved,
    levels row-padded to the fixed TILE so every level block has the shape
    ``dynamic_gather`` requires)."""
    L, T, F = table.shape
    assert (T * F) % LANES == 0, "T·F must be lane-aligned"
    R = T * F // LANES
    assert R <= TILE, "table too large for VMEM residency (T·F > 2^20)"
    p = table.reshape(L, R, LANES)
    if R < TILE:
        p = jnp.pad(p, ((0, 0), (0, TILE - R), (0, 0)))
    # f32 (not bf16): tpu.dynamic_gather requires index/value bitwidth match
    return p.reshape(L * TILE, LANES).astype(jnp.float32)


def _encode_kernel(
    # SMEM per-level constants, shape (L, 1)
    scale_ref,
    res_ref,
    use_hash_ref,
    size_ref,
    # VMEM blocks
    pos_ref,  # (TILE, 3) f32 positions in [0,1]^3
    table_ref,  # (TILE, 128) f32 — this level's packed table (R == TILE)
    out_ref,  # (1, TILE, F) f32
    *,
    n_features: int,
    n_dims: int,
):
    l = pl.program_id(0)
    scale = scale_ref[l, 0]
    res = res_ref[l, 0]
    use_hash = use_hash_ref[l, 0]
    size = size_ref[l, 0]

    F = n_features
    epf = LANES // F  # table entries per packed row

    pos = pos_ref[:, :n_dims]  # (TILE, D)
    p = pos * scale + 0.5
    p0f = jnp.floor(p)
    frac = p - p0f
    p0 = p0f.astype(jnp.int32)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 1)
    feat_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, F), 1)

    acc = jnp.zeros((TILE, F), jnp.float32)
    for c in range(1 << n_dims):
        bits = [(c >> d) & 1 for d in range(n_dims)]
        cpos = [p0[:, d] + bits[d] for d in range(n_dims)]  # D × (TILE,)
        # trilinear weight for this corner
        w = jnp.ones((TILE,), jnp.float32)
        for d in range(n_dims):
            w = w * (frac[:, d] if bits[d] else 1.0 - frac[:, d])

        # hashed index: xor of prime-multiplied coords, masked by pow2 size
        h = cpos[0].astype(jnp.uint32) * np.uint32(_HASH_PRIMES[0])
        for d in range(1, n_dims):
            h = h ^ (cpos[d].astype(jnp.uint32) * np.uint32(_HASH_PRIMES[d]))
        h = (h & (size.astype(jnp.uint32) - 1)).astype(jnp.int32)
        # dense linear index with clamped coords; stride r^d per dim to
        # match the XLA path's ``indices_and_weights``
        cc = [jnp.clip(cpos[d], 0, res - 1) for d in range(n_dims)]
        lin = cc[n_dims - 1]
        for d in range(n_dims - 2, -1, -1):
            lin = lin * res + cc[d]
        idx = jnp.where(use_hash > 0, h, lin)  # (TILE,)

        row = idx // epf
        lane0 = (idx % epf) * F

        row_b = jnp.broadcast_to(row[:, None], (TILE, LANES))
        fetched = jnp.take_along_axis(table_ref[:], row_b, axis=0)  # (TILE, 128)
        sel = jnp.broadcast_to(lane0[:, None], (TILE, LANES)) + (lane_iota % F)
        picked = jnp.take_along_axis(fetched, sel, axis=1)  # (TILE, 128)
        feats = picked[:, :F].astype(jnp.float32)
        acc = acc + w[:, None] * feats

    out_ref[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "table_size", "n_features", "n_dims"),
)
def hashgrid_encode_pallas(
    packed_table: jax.Array,  # (L·R, 128) bf16
    x: jax.Array,  # (N, D) f32, N multiple of TILE
    scales: jax.Array,  # (L, 1) f32
    res: jax.Array,  # (L, 1) i32
    use_hash: jax.Array,  # (L, 1) i32
    sizes: jax.Array,  # (L, 1) i32
    *,
    n_levels: int,
    table_size: int,
    n_features: int,
    n_dims: int = 3,
) -> jax.Array:
    """Returns (N, L, F) float32 features (level-major concat is done by
    the caller)."""
    N = x.shape[0]
    assert N % TILE == 0, "pad sample count to a TILE multiple"
    nb = N // TILE
    L = n_levels
    F = n_features

    kernel = functools.partial(_encode_kernel, n_features=F, n_dims=n_dims)
    # Interpret on CPU so the kernel is testable without hardware.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, x.shape[1]), lambda l, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, LANES), lambda l, b: (l, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, F), lambda l, b: (l, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, N, F), jnp.float32),
        interpret=interpret,
    )(scales, res, use_hash, sizes, x, packed_table)
    return jnp.transpose(out, (1, 0, 2))  # (N, L, F)
