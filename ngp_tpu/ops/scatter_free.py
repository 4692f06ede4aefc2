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

import os

import jax
import jax.numpy as jnp


def blocked_cumsum(x: jax.Array, block: int = 128) -> jax.Array:
    """Inclusive cumsum along the last axis with O(n) memory traffic.

    XLA lowers big cumsums on TPU to a log-depth shifted-add ladder
    (~log2(n) full passes over the array — measured ~48 ms for a
    (16, 2M) fp32 cumsum on v5e). This version does one in-block prefix
    as a triangular matmul on the MXU, a tiny recursive scan over the
    block totals, and one broadcast add: ~3 linear passes total.

    ``x`` (..., N) float32; returns the same shape/dtype.
    """
    *lead, n = x.shape
    if n <= block * 4:
        return jnp.cumsum(x, axis=-1)
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
    nb = (n + pad) // block
    xb = x.reshape(*lead, nb, block)
    # in-block inclusive prefix: xb @ upper-triangular ones (MXU)
    tri = jnp.triu(jnp.ones((block, block), x.dtype))
    # HIGHEST: TPU fp32 dots default to one-pass bf16 rounding, which
    # would poison the later diff-of-cumsums (catastrophic cancellation
    # against the running total); 3-pass keeps true fp32 accuracy.
    pre = jax.lax.dot_general(
        xb, tri, (((xb.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)
    # block offsets: exclusive scan of the block totals (nb ≈ n/128 —
    # small enough that XLA's ladder is cheap; recurse for huge n)
    totals = pre[..., -1]
    off = blocked_cumsum(totals, block) - totals
    out = pre + off[..., None]
    return out.reshape(*lead, n + pad)[..., :n] if pad else out.reshape(*lead, n)


def _pack_bf16_pairs(cols: list[jax.Array]) -> list[jax.Array]:
    """Pack pairs of float32 arrays into int32 arrays via bf16 bit-halves
    (sort payload compression: the TPU sort's cost scales with the number
    of operand columns it moves)."""
    out = []
    for i in range(0, len(cols) - 1, 2):
        lo = jax.lax.bitcast_convert_type(
            cols[i].astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            cols[i + 1].astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        out.append((lo | (hi << 16)).astype(jnp.int32))
    if len(cols) % 2:
        lo = jax.lax.bitcast_convert_type(
            cols[-1].astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        out.append(lo.astype(jnp.int32))
    return out


def _unpack_bf16_pairs(packed: list[jax.Array], n: int) -> list[jax.Array]:
    out = []
    for p in packed:
        u = p.astype(jnp.uint32)
        lo = jax.lax.bitcast_convert_type(
            (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            (u >> 16).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        out.extend([lo, hi])
    return out[:n]


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
    cs = [blocked_cumsum(v) for v in s[2:]]

    # Compact slot rows (in key order) to the front; stable keeps order.
    s2 = jax.lax.sort((1 - flag_sorted, *cs), num_keys=1, is_stable=True)
    slot_cs = jnp.stack([c[:T] for c in s2[1:]], axis=-1)  # (T, F)
    dense = jnp.diff(slot_cs, axis=0, prepend=jnp.zeros((1, F), slot_cs.dtype))
    return dense[:, 0] if squeeze else dense


def batched_segment_sum(
    keys: jax.Array, vals: jax.Array, n_segments: int,
    payload_dtype: str | None = None,
) -> jax.Array:
    """Batched scatter-free segment sum: ``keys`` (L, M) int32 ∈
    [0, n_segments), ``vals`` (L, M, F) → (L, n_segments, F) float32.

    Same slot-sentinel construction as :func:`dense_segment_sum`, but the
    L batches sort independently along the last axis — much cheaper than
    one global sort over L·M keys (bitonic depth log²(M+T) instead of
    log²(L·(M+T)), and better VMEM blocking). Measured on v5e: the global
    2-sort pipeline at L=16, M=2^21 costs ~500 ms; this form ~130 ms.

    Further savings vs the global path (the TPU sort's cost scales with
    the number of operand columns it moves):

    - sort 1 uses a *combined* key ``2·key + is_slot`` (single int32, no
      second key column) with an unstable sort — TPU's bitonic sort is
      deterministic, and within one (key, flag) run the payload order only
      permutes the fp addition order of the cumsum;
    - with ``payload_dtype="bfloat16"`` (the default; env override
      ``NGP_TPU_SEGSUM_PAYLOAD=float32``) pairs of payload columns ride
      the sort packed as bf16 halves of one int32 column; accumulation
      stays fp32 after the sort. The reference accumulates these same
      gradients as fp16 atomics with a 128× loss scale (tcnn grid
      backward, SURVEY §2.10) — bf16-quantized addends with fp32
      accumulation is the same precision class;
    - sort 2 (slot extraction) is one single-operand unstable int sort:
      flag and position packed into one key, payload cumsums *gathered*
      at the slot positions as F-wide rows;
    - the cumsums run through :func:`blocked_cumsum` (one MXU triangular
      matmul + a small scan) instead of XLA's log-depth ladder.
    """
    L, M = keys.shape
    F = vals.shape[-1]
    T = n_segments
    if payload_dtype is None:
        payload_dtype = os.environ.get("NGP_TPU_SEGSUM_PAYLOAD", "bfloat16")

    # Optional MXU strategy (NGP_TPU_SEGSUM_MXU=1): the one-hot matmul
    # kernel (ops/pallas/segsum.py) — zero sort traffic, MACs ∝ M·T·F, so
    # only sensible for bounded tables (NGP_TPU_SEGSUM_MXU_MAX_T).
    if (
        os.environ.get("NGP_TPU_SEGSUM_MXU") == "1"
        and jax.default_backend() == "tpu"
        and T <= int(os.environ.get("NGP_TPU_SEGSUM_MXU_MAX_T", 1 << 19))
    ):
        from ngp_tpu.ops.pallas.segsum import segment_sum_onehot

        return jnp.stack(
            [segment_sum_onehot(keys[l], vals[l], T) for l in range(L)]
        )

    slot_keys = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (L, T))
    comb = jnp.concatenate(
        [keys.astype(jnp.int32) * 2, slot_keys * 2 + 1], axis=1
    )  # (L, M+T)
    zpad = jnp.zeros((L, T), vals.dtype)
    cols = [jnp.concatenate([vals[:, :, f], zpad], axis=1) for f in range(F)]
    if payload_dtype == "bfloat16":
        cols = _pack_bf16_pairs(cols)

    s = jax.lax.sort((comb, *cols), num_keys=1, is_stable=False)
    comb_sorted = s[0]
    sorted_cols = (
        _unpack_bf16_pairs(list(s[1:]), F)
        if payload_dtype == "bfloat16"
        else list(s[1:])
    )
    cs = jnp.stack(
        [blocked_cumsum(c) for c in sorted_cols], axis=-1
    )  # (L, M+T, F)

    # Positions of the slot rows, in key order. Slots carry odd combined
    # keys; giving them keys < M+T and data keys ≥ M+T, one single-operand
    # unstable sort leaves the slot positions (already pos-ordered within
    # the slot class) as the first T entries.
    pos = jnp.broadcast_to(
        jnp.arange(M + T, dtype=jnp.int32)[None, :], (L, M + T)
    )
    flagged_pos = jnp.where((comb_sorted & 1) == 1, pos, pos + (M + T))
    (fp_sorted,) = jax.lax.sort((flagged_pos,), num_keys=1, is_stable=False)
    slot_pos = fp_sorted[:, :T]  # (L, T)

    slot_cs = jnp.take_along_axis(
        cs, slot_pos[..., None], axis=1
    )  # (L, T, F) — one F-wide row gather per slot, not F element gathers
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
