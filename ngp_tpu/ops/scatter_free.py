"""Scatter-free dense segment reductions.

XLA's scatter on TPU serializes colliding (and even non-colliding) updates
— measured ~60 ns/element on v5e, ~2 s for a 33.5M-element scatter-add —
which poisons every "accumulate by index" op in the frameworks's hot paths
(hash-grid gradients, occupancy-grid splats). These helpers compute dense
``segment_sum`` / ``segment_max`` with sorts, cumsums, and gathers only:

1. concatenate the M data rows with one sentinel "slot" row per output
   index (slot value 0);
2. stable-sort by (key, is_slot) so each slot lands right after its
   segment's data;
3. inclusive cumsum over the sorted values;
4. stable-sort by is_slot to compact the slot rows — they emerge in key
   order, so slot *t* is at position *t*;
5. ``dense[t] = slot_cs[t] − slot_cs[t−1]``.

Cost: two O((M+T)·log) bitonic sorts + one cumsum — ~500 ms for M=33.5M on
v5e vs ~4 s for the scatter it replaces, fully parallel and deterministic.

``segment_max`` reduces to ``segment_sum``: sort (key asc, value desc),
zero all but each run's first row, then sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_segment_sum(keys: jax.Array, vals: jax.Array, n_segments: int) -> jax.Array:
    """Sum ``vals`` (M,) or (M, F) into a dense (n_segments,)/(n_segments, F)
    array by ``keys`` (M,) int32 ∈ [0, n_segments). Scatter-free."""
    squeeze = vals.ndim == 1
    if squeeze:
        vals = vals[:, None]
    M, F = vals.shape
    T = n_segments

    comb_keys = jnp.concatenate([keys.astype(jnp.int32), jnp.arange(T, dtype=jnp.int32)])
    comb_flag = jnp.concatenate(
        [jnp.zeros((M,), jnp.int32), jnp.ones((T,), jnp.int32)]
    )
    comb_vals = [
        jnp.concatenate([vals[:, f], jnp.zeros((T,), vals.dtype)]) for f in range(F)
    ]

    s = jax.lax.sort((comb_keys, comb_flag, *comb_vals), num_keys=2, is_stable=True)
    flag_sorted = s[1]
    cs = [jnp.cumsum(v) for v in s[2:]]

    # Compact slot rows (in key order) to the front; stable keeps order.
    s2 = jax.lax.sort((1 - flag_sorted, *cs), num_keys=1, is_stable=True)
    slot_cs = jnp.stack([c[:T] for c in s2[1:]], axis=-1)  # (T, F)
    dense = jnp.diff(slot_cs, axis=0, prepend=jnp.zeros((1, F), slot_cs.dtype))
    return dense[:, 0] if squeeze else dense


def batched_segment_sum(
    keys: jax.Array, vals: jax.Array, n_segments: int
) -> jax.Array:
    """Batched scatter-free segment sum: ``keys`` (L, M) int32 ∈
    [0, n_segments), ``vals`` (L, M, F) → (L, n_segments, F).

    Same slot-sentinel construction as :func:`dense_segment_sum`, but the
    L batches sort independently along the last axis — much cheaper than
    one global sort over L·M keys (bitonic depth log²(M+T) instead of
    log²(L·(M+T)), and better VMEM blocking). Measured on v5e: the global
    2-sort pipeline at L=16, M=2^21 costs ~500 ms; this form ~130 ms.

    Two further savings vs the global path:

    - sort 1 uses a *combined* key ``2·key + is_slot`` (single int32, no
      second key column) with an unstable sort — TPU's bitonic sort is
      deterministic, and within one (key, flag) run the payload order only
      permutes the fp addition order of the cumsum;
    - sort 2 (slot extraction) carries only int32 positions, not the F
      float payload columns; the payload cumsums are then *gathered* at
      the slot positions (T rows per level, ~free) instead of sorted.
    """
    L, M = keys.shape
    F = vals.shape[-1]
    T = n_segments

    slot_keys = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (L, T))
    comb = jnp.concatenate(
        [keys.astype(jnp.int32) * 2, slot_keys * 2 + 1], axis=1
    )  # (L, M+T)
    zpad = jnp.zeros((L, T), vals.dtype)
    cols = [jnp.concatenate([vals[:, :, f], zpad], axis=1) for f in range(F)]

    s = jax.lax.sort((comb, *cols), num_keys=1, is_stable=False)
    comb_sorted = s[0]
    cs = [jnp.cumsum(c, axis=1) for c in s[1:]]

    # Positions of the slot rows, in key order: stable int-only flag sort
    # (slots carry odd combined keys; flag 0 sorts them to the front).
    is_data = jnp.logical_not(comb_sorted & 1).astype(jnp.int32)
    pos = jnp.broadcast_to(
        jnp.arange(M + T, dtype=jnp.int32)[None, :], (L, M + T)
    )
    _, pos_sorted = jax.lax.sort((is_data, pos), num_keys=1, is_stable=True)
    slot_pos = pos_sorted[:, :T]  # (L, T)

    slot_cs = jnp.stack(
        [jnp.take_along_axis(c, slot_pos, axis=1) for c in cs], axis=-1
    )  # (L, T, F)
    return jnp.diff(
        slot_cs, axis=1, prepend=jnp.zeros((L, 1, F), slot_cs.dtype)
    )


def dense_segment_max(
    keys: jax.Array, vals: jax.Array, n_segments: int, initial: float = 0.0
) -> jax.Array:
    """Max of ``vals`` (M,) into a dense (n_segments,) array by ``keys``;
    untouched segments get ``initial``. Scatter-free: sort (key asc, val
    desc), keep each run's head, then segment-sum the heads."""
    ks, negv = jax.lax.sort(
        (keys.astype(jnp.int32), -vals), num_keys=2, is_stable=False
    )
    v = -negv
    is_head = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    head_vals = jnp.where(is_head, v - initial, 0.0)
    return dense_segment_sum(ks, head_vals, n_segments) + initial
