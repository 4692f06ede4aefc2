"""Dense segment sums over KEY-SORTED data — the TPU hash-grid gradient
accumulator (replaces the reference's fp16 ``atomicAdd`` grid backward,
tiny-cuda-nn grid kernel, SURVEY §2.10).

Problem: ``dense[t, f] = Σ_j vals[j, f]·[keys[j] == t]`` with ``keys``
already sorted ascending, M ≈ 6.5e5 rows, T ≈ 2.6e5 table rows, F ≈ 4.

The cumsum+histogram extractor (blocked cumsum over M + M·T MXU histogram
+ T-row run-end gather) measures ~13.4 ms at this geometry on v5e on top
of the ~10.6 ms sort; its cost is three M/T-scale passes (2.3 + 7.6 + 8.2
ms standalone). This kernel replaces all three with ONE streamed pass of
block-windowed one-hot matmuls:

- the sorted array is partitioned into the element windows of each
  RB=1024-row output block by a 256-bucket coarse histogram
  (:func:`block_starts_for` — exact counts, so windows are exact up to
  the kernel's internal 1024-element tile alignment);
- per window tile, the segment sum restricted to the block's 1024 rows is
  a kron-factored one-hot matmul (the ``ops/pallas/segsum.py`` trick, but
  against 1024 rows instead of the whole table): with ``t = hi·128 + lo``
  (hi ∈ [0, 8) inside the block), accumulate
  ``acc[f·8 + hi, lo] += Σ_e [hi_e = hi]·v_f[e] · [lo_e = lo]``
  as one ``(F·8, 128) @ (128, 128)ᵀ`` bf16 matmul per 128-element row.
  Values bind into the *hi*-side one-hot — (8, 128) selects, one vreg per
  feature — so one-hot construction is ~22 vreg-ops per 128 elements;
  the 128-wide lo one-hot carries no values and is reused by all
  features. MACs = E·1024·F versus the direct kernel's M·T·F — the sort
  is what buys the 256x MAC reduction;
- elements outside the block's rows (window slop, the sentinel tail pad)
  have ``hi − 8·b`` outside [0, 8): their one-hot column is all-zero, so
  any covering window is correct — work scales with the actual elements
  per block, pathological key concentrations cost time, never
  correctness.

Sorted elements stream through double-buffered HBM→VMEM slab DMA.
Accumulation is bf16 addends into an fp32 accumulator — the same
precision class as the reference's fp16 atomics with loss scaling (tcnn
grid backward) and as this module's sort-payload bf16 packing.

(An interval-extraction design — per-chunk lane cumsum + vectorized
binary search per output row — lived here through round 5; it measured
~28 ms at the bench geometry against ~13 ms for cumsum+hist and the
~3 ms of this kernel, because 12 dynamic (8, 128) gathers per 128
elements lose to one 128-contraction matmul. See git history.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Static kernel geometry. RB = output rows per grid step (8 hi values x
# 128 lo); CH = elements per inner row (one 128-lane vreg); TILE = the
# (8, CH) element tile; ST = tiles per DMA slab; Q = lo width.
RB = 1024
CH = 128
TILE = 8 * CH
ST = 2
Q = 128


def _segsum_sorted_kernel(
    starts_ref,  # SMEM (L, NB+1) int32 — element offsets per row block
    keys_ref,  # ANY (L, Mp//TILE, 8, CH) int32 sorted keys (+ sentinel pad)
    vals_ref,  # ANY (L, F, Mp//TILE, 8, CH) f32 payload in sorted order
    out_ref,  # VMEM (1, F*8, Q) f32 — acc[f*8 + hi, lo]
    key_slab,  # VMEM (2, ST, 8, CH) int32 scratch (double-buffered)
    val_slab,  # VMEM (2, F, ST, 8, CH) f32 scratch
    acc_ref,  # VMEM (F*8, Q) f32 scratch
    sem_k,  # DMA sems (2,)
    sem_v,
    *,
    n_feat: int,
):
    l = pl.program_id(0)
    b = pl.program_id(1)
    start = starts_ref[l, b]
    end = starts_ref[l, b + 1]

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # TILE-aligned first tile; the padded tail slab keeps DMA in-bounds.
    t0 = start // TILE
    n_tiles = jax.lax.select(
        end > start, (end + TILE - 1) // TILE - t0, 0
    )
    n_slabs = pl.cdiv(n_tiles, ST)

    def dma(si, buf):
        sc0 = t0 + si * ST
        ck = pltpu.make_async_copy(
            keys_ref.at[l, pl.ds(sc0, ST)], key_slab.at[buf], sem_k.at[buf]
        )
        cv = pltpu.make_async_copy(
            vals_ref.at[l, :, pl.ds(sc0, ST)], val_slab.at[buf],
            sem_v.at[buf],
        )
        return ck, cv

    @pl.when(n_slabs > 0)
    def _start_first():
        ck, cv = dma(0, 0)
        ck.start()
        cv.start()

    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, CH), 0)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (8, CH), 0)

    def slab_body(si, _):
        buf = jax.lax.rem(si, 2)
        ck, cv = dma(si, buf)
        ck.wait()
        cv.wait()

        @pl.when(si + 1 < n_slabs)
        def _prefetch():
            nk, nv = dma(si + 1, 1 - buf)
            nk.start()
            nv.start()

        tiles_here = jnp.minimum(n_tiles - si * ST, ST)

        def tile_body(ci, _):
            for r in range(8):
                krow = key_slab[buf, ci, r, :].reshape(1, CH)
                hi = (krow >> 7) - b * 8  # outside [0, 8) -> zero one-hot
                lo = krow & (Q - 1)
                lo1h = (lo_iota == jnp.broadcast_to(lo, (Q, CH))).astype(
                    jnp.bfloat16
                )
                hi1h = hi_iota == jnp.broadcast_to(hi, (8, CH))
                w = jnp.concatenate(
                    [
                        jnp.where(
                            hi1h,
                            val_slab[buf, f, ci, r, :].reshape(1, CH),
                            0.0,
                        ).astype(jnp.bfloat16)
                        for f in range(n_feat)
                    ],
                    axis=0,
                )  # (F*8, CH)
                acc_ref[...] += jax.lax.dot_general(
                    w, lo1h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return ()

        jax.lax.fori_loop(0, tiles_here, tile_body, ())
        return ()

    jax.lax.fori_loop(0, n_slabs, slab_body, ())
    out_ref[0] = acc_ref[...]


@functools.partial(
    jax.jit, static_argnames=("n_segments", "interpret")
)
def segment_sum_sorted_blocks(
    keys_sorted: jax.Array,  # (L, M) int32, ascending per level
    vals_sorted: jax.Array,  # (L, F, M) f32, same order
    block_starts: jax.Array,  # (L, NB+1) int32 — see block_starts_for
    n_segments: int,  # T, multiple of RB
    interpret: bool = False,
) -> jax.Array:
    """(L, T, F) dense sums from key-sorted data. ``block_starts[l, b]``
    must be the EXACT count of keys < b·RB (``block_starts_for`` computes
    this); starts[l, NB] = M. Exactness matters because starts[b+1]
    doubles as block b's element-window end — a smaller value would drop
    that block's tail elements. Window *starts* self-mask (out-of-block
    elements hit all-zero one-hot columns), so the kernel's internal
    TILE alignment of the start costs only time."""
    L, M = keys_sorted.shape
    F = vals_sorted.shape[1]
    T = n_segments
    assert T % RB == 0, T
    NB = T // RB

    # pad M to a TILE multiple + one spare slab (TILE-aligned windows let
    # the last slab of a block run past the data) with a sentinel key
    Mp = -(-max(M, TILE) // TILE) * TILE + ST * TILE
    keys_sorted = jnp.pad(
        keys_sorted, ((0, 0), (0, Mp - M)), constant_values=np.int32(2**30)
    )
    vals_sorted = jnp.pad(vals_sorted, ((0, 0), (0, 0), (0, Mp - M)))
    keys4 = keys_sorted.reshape(L, Mp // TILE, 8, CH)
    vals5 = vals_sorted.reshape(L, F, Mp // TILE, 8, CH)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, F * 8, Q), lambda l, b, starts: (l * NB + b, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ST, 8, CH), jnp.int32),
            pltpu.VMEM((2, F, ST, 8, CH), jnp.float32),
            pltpu.VMEM((F * 8, Q), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_sorted_kernel, n_feat=F),
        out_shape=jax.ShapeDtypeStruct((L * NB, F * 8, Q), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_starts.astype(jnp.int32), keys4, vals5)
    # rows: out[l*NB + b, f*8 + hi, lo] -> dense[l, b*1024 + hi*128 + lo, f]
    out = out.reshape(L, NB, F, 8, Q)
    return jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(L, T, F)


def block_starts_for(
    keys: jax.Array, n_segments: int, interpret: bool = False
) -> jax.Array:
    """(L, NB+1) exact element offsets for :func:`segment_sum_sorted_blocks`
    from UNSORTED keys: a 256-ish-bucket coarse histogram (one tiny MXU
    one-hot per level) + cumsum. ``starts[l, b]`` = #keys < b·RB."""
    from ngp_tpu.ops.pallas.segsum import segment_count_onehot_batched

    L, M = keys.shape
    NB = n_segments // RB
    coarse = jnp.minimum(
        (keys >> np.int32(np.log2(RB))).astype(jnp.int32), NB - 1
    )
    cnt = segment_count_onehot_batched(coarse, NB, interpret=interpret)  # (L, NB)
    ends = jnp.cumsum(cnt, axis=1)
    return jnp.concatenate(
        [jnp.zeros((L, 1), jnp.int32), ends.astype(jnp.int32)], axis=1
    )
