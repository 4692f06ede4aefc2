"""Dense segment sums over KEY-SORTED data — the TPU hash-grid gradient
accumulator (replaces the reference's fp16 ``atomicAdd`` grid backward,
tiny-cuda-nn grid kernel, SURVEY §2.10).

Problem: ``dense[t, f] = Σ_j vals[j, f]·[keys[j] == t]`` with ``keys``
already sorted ascending, M ≈ 6.5e5 rows, T ≈ 2.6e5 table rows, F ≈ 4.

The round-3 pipeline (blocked cumsum over M + per-row MXU histogram +
T-row run-end gather) pays three M/T-scale passes whose cost is dominated
by the ends gather (~2 ms/level: T row-gathers at the ~8 ns/row issue
floor) and the M·T int8 histogram (~1 ms/level). This kernel removes all
three stages: the sorted array is streamed once, and every table row's
value is extracted as an *interval sum* of a chunk-local cumulative sum —
``dense[t] = cs[count(keys ≤ t)] − cs[count(keys < t)]`` — using only
vector-register-local operations:

- per 128-element chunk: an in-lane inclusive cumsum (7 shifted adds);
- per 1024-row output block: two 7-round vectorized binary searches over
  the chunk's sorted keys (``count ≤ r`` and ``count < r`` for all 1024
  rows at once), implemented with ``take_along_axis`` on (8, 128) tiles —
  the one dynamic-gather shape Mosaic supports (in-vreg, 128-lane range);
- the interval difference is self-masking: chunk elements belonging to
  other row blocks appear in both or neither cumsum term, so block
  element windows only need to be *covering*, never exact.

Work scales with the actual number of elements per row block (streamed by
manual HBM→VMEM DMA with exact per-block windows from a 256-bucket coarse
histogram), so pathological key concentrations cost time, never
correctness — unlike fixed-capacity windowed-matmul designs that drop
overflow.

Measured v5e (L=6 hashed levels, M=655360, F=4, T=2^18): the round-3
pipeline's sort+cumsum+hist+gather ≈ 30 ms; sort + this kernel ≈ 11 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Static kernel geometry. RB = output rows per grid step; CH = sorted
# elements consumed per inner iteration (one 128-lane vreg); SLAB = HBM→
# VMEM DMA granularity (CH-multiple).
RB = 1024
CH = 128
SLAB = 2048


def _lane_cumsum(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last (lane) axis of a (..., 128) tile
    via 7 shifted adds (log2(128) rounds, all in-vreg)."""
    n = x.shape[-1]
    shift = 1
    while shift < n:
        x = x + jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(shift, 0)])[..., :n]
        shift *= 2
    return x


def _count_sorted(keys_tile: jax.Array, rows: jax.Array, strict: bool) -> jax.Array:
    """For each row value r in ``rows`` (8, 128), count elements of the
    SORTED 128-vector ``keys_tile`` (1, 128) that are < r (strict) or ≤ r.
    7-round vectorized binary search; every gather is take_along_axis on
    (8, 128) with indices in [0, 128) — in-vreg."""
    kb = jnp.broadcast_to(keys_tile.reshape(1, CH), (8, CH))
    lo = jnp.zeros(rows.shape, jnp.int32)  # count in [lo, hi]
    hi = jnp.full(rows.shape, CH, jnp.int32)
    for _ in range(8):  # count ranges over 129 values: ceil(log2(129)) = 8
        mid = (lo + hi + 1) // 2  # round UP: lo=mid must make progress
        kv = jnp.take_along_axis(kb, jnp.clip(mid - 1, 0, CH - 1), axis=1)
        # counting elements with key < r (strict) or ≤ r: count can be
        # `mid` only if key[mid-1] passes the predicate
        ok = (kv < rows) if strict else (kv <= rows)
        ok = ok & (mid >= 1)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
    return lo


def _segsum_sorted_kernel(
    starts_ref,  # SMEM (L, NB+1) int32 — element offsets per row block
    keys_ref,  # ANY (L, Mp//CH, CH) int32 sorted keys (padded w/ sentinel)
    vals_ref,  # ANY (L, F, Mp//CH, CH) f32 payload in sorted order
    out_ref,  # VMEM (1, F, RB) f32
    key_slab,  # VMEM (SLAB//CH, CH) int32 scratch
    val_slab,  # VMEM (F, SLAB//CH, CH) f32 scratch
    acc_ref,  # VMEM (F, 8, CH) f32 scratch
    sem_k,
    sem_v,
    *,
    n_feat: int,
):
    l = pl.program_id(0)
    b = pl.program_id(1)
    start = starts_ref[l, b]
    end = starts_ref[l, b + 1]
    row0 = b * RB

    # output rows of this block, laid out as the (8, 128) tile the lane
    # gathers need: rows[s, c] = row0 + s*128 + c
    rows = (
        row0
        + jax.lax.broadcasted_iota(jnp.int32, (8, CH), 0) * CH
        + jax.lax.broadcasted_iota(jnp.int32, (8, CH), 1)
    )
    acc_ref[...] = jnp.zeros_like(acc_ref)

    # First chunk, SLAB-aligned: keeps every DMA inside the padded array
    # without clamping (clamping would re-read chunks and double-count).
    # The extra leading elements are self-masked by the interval math.
    c0 = (start // SLAB) * (SLAB // CH)
    n_chunks = jax.lax.select(end > start, (end - 1) // CH - c0 + 1, 0)
    n_slabs = pl.cdiv(n_chunks, SLAB // CH)

    def slab_body(si, _):
        sc0 = c0 + si * (SLAB // CH)
        # one DMA per slab: SLAB sorted keys + their payloads
        ck = pltpu.make_async_copy(
            keys_ref.at[l, pl.ds(sc0, SLAB // CH), :], key_slab, sem_k
        )
        cv = pltpu.make_async_copy(
            vals_ref.at[l, :, pl.ds(sc0, SLAB // CH), :], val_slab, sem_v
        )
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()
        chunks_here = jnp.minimum(n_chunks - si * (SLAB // CH), SLAB // CH)

        def chunk_body(ci, _):
            keys_tile = key_slab[ci, :]  # (CH,) sorted
            cnt_le = _count_sorted(keys_tile, rows, strict=False)
            cnt_lt = _count_sorted(keys_tile, rows, strict=True)
            for f in range(n_feat):
                cs = _lane_cumsum(val_slab[f, ci, :].reshape(1, CH))
                csb = jnp.broadcast_to(cs, (8, CH))
                hi_v = jnp.take_along_axis(
                    csb, jnp.clip(cnt_le - 1, 0, CH - 1), axis=1
                )
                hi_v = jnp.where(cnt_le > 0, hi_v, 0.0)
                lo_v = jnp.take_along_axis(
                    csb, jnp.clip(cnt_lt - 1, 0, CH - 1), axis=1
                )
                lo_v = jnp.where(cnt_lt > 0, lo_v, 0.0)
                acc_ref[f] += hi_v - lo_v
            return ()

        jax.lax.fori_loop(0, chunks_here, chunk_body, ())
        return ()

    jax.lax.fori_loop(0, n_slabs, slab_body, ())
    out_ref[0] = acc_ref[...].reshape(n_feat, RB)


@functools.partial(
    jax.jit, static_argnames=("n_segments", "interpret")
)
def segment_sum_sorted_blocks(
    keys_sorted: jax.Array,  # (L, M) int32, ascending per level
    vals_sorted: jax.Array,  # (L, M, F) f32, same order
    block_starts: jax.Array,  # (L, NB+1) int32 — see block_starts_for
    n_segments: int,  # T, multiple of RB
    interpret: bool = False,
) -> jax.Array:
    """(L, T, F) dense sums from key-sorted data. ``block_starts[l, b]``
    must satisfy starts[b] ≤ first element of row block b (any covering
    offsets work — the interval math self-masks); starts[l, NB] = M."""
    L, M = keys_sorted.shape
    F = vals_sorted.shape[-1]
    T = n_segments
    assert T % RB == 0, T
    NB = T // RB

    # pad M to a SLAB multiple with an out-of-range sentinel key
    Mp = -(-max(M, SLAB) // SLAB) * SLAB
    if Mp != M:
        keys_sorted = jnp.pad(
            keys_sorted, ((0, 0), (0, Mp - M)), constant_values=np.int32(2**30)
        )
        vals_sorted = jnp.pad(vals_sorted, ((0, 0), (0, Mp - M), (0, 0)))
    keys3 = keys_sorted.reshape(L, Mp // CH, CH)
    vals4 = jnp.transpose(vals_sorted, (0, 2, 1)).reshape(L, F, Mp // CH, CH)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, F, RB), lambda l, b, starts: (l, 0, b)
        ),
        scratch_shapes=[
            pltpu.VMEM((SLAB // CH, CH), jnp.int32),
            pltpu.VMEM((F, SLAB // CH, CH), jnp.float32),
            pltpu.VMEM((F, 8, CH), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_sorted_kernel, n_feat=F),
        out_shape=jax.ShapeDtypeStruct((L, F, T), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_starts.astype(jnp.int32), keys3, vals4)
    return jnp.transpose(out, (0, 2, 1))


def block_starts_for(keys: jax.Array, n_segments: int) -> jax.Array:
    """(L, NB+1) covering element offsets for :func:`segment_sum_sorted_blocks`
    from UNSORTED keys: a 256-ish-bucket coarse histogram (one tiny MXU
    one-hot per level) + cumsum. ``starts[l, b]`` = #keys < b·RB."""
    from ngp_tpu.ops.pallas.segsum import segment_count_onehot_batched

    L, M = keys.shape
    NB = n_segments // RB
    coarse = jnp.minimum(
        (keys >> np.int32(np.log2(RB))).astype(jnp.int32), NB - 1
    )
    cnt = segment_count_onehot_batched(coarse, NB)  # (L, NB) int32
    ends = jnp.cumsum(cnt, axis=1)
    return jnp.concatenate(
        [jnp.zeros((L, 1), jnp.int32), ends.astype(jnp.int32)], axis=1
    )
