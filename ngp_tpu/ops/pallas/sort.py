"""VMEM-resident batched bitonic sort — Pallas TPU kernel.

XLA's `lax.sort` on TPU round-trips HBM between merge passes: measured
6.8-16.3 ms for (2-4, 655k) rows with 1-4 payload columns (bench_r3).
The hash-grid backward's sort problem is small enough to sit ENTIRELY in
VMEM (2^20 int32 keys + positions = 8 MB), where all ~log²(n)/2 bitonic
stages run at VPU speed with zero HBM traffic beyond one load and one
store.

Each batch row lives in VMEM as an (R, 128) int32 tile with row-major
logical indexing ``i = r·128 + c``. A stage at stride j ≥ 128 pairs
sublane rows, j < 128 pairs lanes; both fetch the XOR-partner with two
``pltpu.roll`` rotates + a select (Mosaic has no lane-splitting vector
reshape).

Sorts (key, pos) pairs ascending by key; payload columns are gathered by
``pos`` afterwards (keeping the kernel at 2 arrays — VMEM bound — costs
one post-gather, measured cheaper than carrying packed payloads through
XLA's sort).

Caller contract: n must be a power of two; pad keys with INT32_MAX
(padding sorts to the tail).

DISPOSITION (round 5): not wired into the production backward, kept as a
documented experiment. The premise — sort (key, pos) in VMEM, gather
payloads afterwards — loses at production sizes: the post-sort payload
gather pays the ~8 ns/row HBM issue floor (~16 ms for the quads
backward's 2M payload rows), more than the XLA sort costs outright
(7.3 ms). It would win only for payload-free sorts, which the backward
no longer has (the block-windowed one-hot kernel consumes sorted
payloads directly; see ops/pallas/segsum_sorted.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _stage(kv, gidx, j, k):
    """One bitonic compare-exchange stage at stride j in merge phase k.
    ``kv`` is a tuple of (R, 128) int32 arrays (key first); ``gidx`` the
    logical index i = r·128 + c of each element. Partner fetch is two
    lane/sublane rotates + a select (Mosaic has no lane-splitting vector
    reshape, and rolls are single-pass VPU work anyway)."""
    key = kv[0]
    if j >= _LANES:
        axis, s, ln = 0, j // _LANES, key.shape[0]
    else:
        axis, s, ln = 1, j, _LANES
    is_low = (gidx & j) == 0
    asc = ((gidx >> k) & 1) == 0
    want_small = asc == is_low

    def partner(x):
        return jnp.where(
            is_low, pltpu.roll(x, ln - s, axis), pltpu.roll(x, s, axis)
        )

    pk = partner(key)
    # boolean algebra instead of select-on-bools (Mosaic cannot truncate
    # i8 selects to i1 vectors)
    take = (want_small & (pk < key)) | (~want_small & (pk > key))
    out = [jnp.where(take, pk, key)]
    for x in kv[1:]:
        out.append(jnp.where(take, partner(x), x))
    return tuple(out)


def _sort_kernel(jk_ref, key_ref, key_out, pos_out, *, R: int, n: int):
    """Runs all log²-ish bitonic stages as ONE fori_loop over a prefetched
    (n_stages, 2) stage table — a fully unrolled 210-stage kernel at
    n = 2^20 takes Mosaic many minutes to compile; the loop body with
    dynamic rotate amounts compiles in seconds."""
    key = key_ref[0]
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    )
    gidx = pos
    p = int(np.log2(n))
    n_stages = p * (p + 1) // 2

    def body(i, kv):
        key, pos = kv
        j = jk_ref[i, 0]
        k = jk_ref[i, 1]
        lane_stage = j < _LANES
        s_lane = jnp.where(lane_stage, j, 0)
        s_row = jnp.where(lane_stage, 0, j // _LANES)
        is_low = (gidx & j) == 0
        asc = ((gidx >> k) & 1) == 0
        want_small = asc == is_low

        def partner(x):
            # rotate along both axes; the inactive axis gets shift 0
            f = pltpu.roll(pltpu.roll(x, _LANES - s_lane, 1), R - s_row, 0)
            b = pltpu.roll(pltpu.roll(x, s_lane, 1), s_row, 0)
            return jnp.where(is_low, f, b)

        pk = partner(key)
        take = (want_small & (pk < key)) | (~want_small & (pk > key))
        return (
            jnp.where(take, pk, key),
            jnp.where(take, partner(pos), pos),
        )

    key, pos = jax.lax.fori_loop(0, n_stages, body, (key, pos))
    key_out[0] = key
    pos_out[0] = pos


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_pos(keys: jax.Array, interpret: bool = False):
    """Sort each row of ``keys`` (B, n) int32 ascending, n a power of two
    (pad with INT32_MAX). Returns (sorted_keys, perm) where
    ``sorted[b, i] = keys[b, perm[b, i]]`` — the argsort permutation to
    gather payloads with. The position iota is generated inside the
    kernel, so only the keys ride HBM."""
    B, n = keys.shape
    assert n & (n - 1) == 0, "n must be a power of two"
    assert n >= 128, "rows shorter than one lane tile would reshape to zero tiles"
    R = n // _LANES
    k3 = keys.reshape(B, R, _LANES)
    p = int(np.log2(n))
    jk = np.asarray(
        [(1 << lj, k) for k in range(1, p + 1) for lj in range(k - 1, -1, -1)],
        np.int32,
    )

    sk, sp = pl.pallas_call(
        functools.partial(_sort_kernel, R=R, n=n),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.int32),
        ],
        # alias the key block in-place and allow the working set (key +
        # pos + rotate temporaries) past the 16M default scoped limit —
        # v5e has 128M physical VMEM
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.asarray(jk), k3)
    return sk.reshape(B, n), sp.reshape(B, n)
