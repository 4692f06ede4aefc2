"""MXU one-hot segment sum / histogram — Pallas TPU kernels for the
hash-grid gradient accumulation.

The hash-grid backward must compute ``dense[t, f] = Σ_{m: keys[m]=t}
vals[m, f]`` (the reference scatter-adds this with fp16 atomics — tcnn's
grid backward, SURVEY §2.10). TPU has no fast scatter, and Mosaic's
``dynamic_gather`` is vreg-local, so neither a scatter nor an in-VMEM
gather kernel is available. What the TPU *does* have is a monstrous MXU —
so these kernels reformulate the segment sum as a chain of one-hot
matmuls with a kron-factored key:

    hi = key >> 7, lo = key & 127
    acc[hi, f·128 + lo] += Σ_s onehotᵀ(hi_s)[hi] · (onehot(lo_s)[lo] · v[s, f])

Two kernels:

- :func:`segment_sum_onehot` — full (T, F) segment sum. MACs = M·T_pad·F,
  so only profitable for bounded tables; the sort-based path
  (``ops/scatter_free.py``) is the fallback for larger ones.
- :func:`segment_count_onehot` — F-free histogram (MACs = M·T_pad). Used
  by the sort-based path itself to locate each table row's run inside the
  sorted sample array (replacing a second full sort + slot-sentinel rows
  with one cheap matmul — see ``batched_segment_sum``).

v2 geometry (measured on v5e, scripts/bench_r3.py): the grid is
(hi-blocks × chunks) with chunks minor, so each (HB, 128·F) fp32
accumulator block stays VMEM-resident across its chunk sweep; sc = 2048
samples per chunk keeps the matmul MXU-shaped ((HB × sc) @ (sc × 128F))
and amortizes the accumulator read-modify-write. One-hot construction is
VPU work of MACs/128F — negligible next to the matmul it feeds.

No dynamic indexing anywhere — compiles with stock Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q = 128  # lo-factor width = lane count


def _kernel(keys_ref, vals_ref, out_ref, *, HB: int, F: int, sc: int):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    k = keys_ref[:]  # (sc, 1) int32
    hi = (k >> 7) - b * HB  # rows outside this hi-block -> no one-hot match
    lo = k & (_Q - 1)

    # transposed hi one-hot: (HB, sc); padded keys carry hi >= H -> all-zero
    ohT = (
        jax.lax.broadcasted_iota(jnp.int32, (HB, sc), 0)
        == jnp.transpose(hi, (1, 0))
    ).astype(jnp.bfloat16)
    # lo one-hot scaled by each feature column: (sc, F*128), f-major blocks
    lo1h = jax.lax.broadcasted_iota(jnp.int32, (sc, _Q), 1) == lo
    if F == 0:  # histogram mode: unscaled lo one-hot
        w = lo1h.astype(jnp.bfloat16)
    else:
        w = jnp.concatenate(
            [
                jnp.where(lo1h, vals_ref[:, f : f + 1], 0.0).astype(jnp.bfloat16)
                for f in range(F)
            ],
            axis=1,
        )
    out_ref[:] += jnp.dot(ohT, w, preferred_element_type=jnp.float32)


def _run(keys, vals, n_segments: int, F: int, sc: int, hb: int, interpret: bool):
    """Shared driver. ``F == 0`` means histogram (vals is a dummy)."""
    M = keys.shape[0]
    T_pad = -(-n_segments // _Q) * _Q
    H = T_pad // _Q
    HB = min(hb, H)
    n_hi = -(-H // HB)
    m_pad = (-M) % sc
    Fc = max(F, 1)
    if m_pad:
        keys = jnp.concatenate(
            [keys, jnp.full((m_pad,), n_hi * HB * _Q, jnp.int32)]
        )  # hi past every block -> zero one-hot row
        vals = jnp.concatenate([vals, jnp.zeros((m_pad, vals.shape[1]), vals.dtype)])
    n_chunks = keys.shape[0] // sc

    out = pl.pallas_call(
        functools.partial(_kernel, HB=HB, F=F, sc=sc),
        grid=(n_hi, n_chunks),
        in_specs=[
            pl.BlockSpec((sc, 1), lambda b, c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (sc, vals.shape[1]), lambda b, c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (HB, Fc * _Q), lambda b, c: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_hi * HB, Fc * _Q), jnp.float32),
        interpret=interpret,
    )(keys[:, None].astype(jnp.int32), vals)
    return out, T_pad


@functools.partial(
    jax.jit, static_argnames=("n_segments", "sc", "hb", "interpret")
)
def segment_sum_onehot(
    keys: jax.Array,  # (M,) int32 in [0, n_segments)
    vals: jax.Array,  # (M, F) float
    n_segments: int,
    sc: int = 2048,
    hb: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Dense (n_segments, F) float32 segment sum on the MXU. Addends ride
    the matmul as bf16 (same precision class as tcnn's fp16 atomic
    accumulation); the accumulator is fp32."""
    M, F = vals.shape
    out, T_pad = _run(keys, vals.astype(jnp.float32), n_segments, F, sc, hb, interpret)
    H2 = out.shape[0]
    # (H2, F, 128) -> (H2, 128, F) -> rows are hi*128 + lo
    dense = jnp.transpose(out.reshape(H2, F, _Q), (0, 2, 1)).reshape(H2 * _Q, F)
    return dense[:n_segments]


def _kernel_count_batched(keys_ref, out_ref, *, HB: int, sc: int):
    b = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    k = keys_ref[0]  # (8, sc/8) int32 — natural row-major layout, no copy
    hi = (k >> 7) - b * HB
    lo = k & (_Q - 1)
    scq = sc // 8
    acc = jnp.zeros((HB, _Q), jnp.int32)
    for r in range(8):
        # int8 one-hots: 4 int8 lanes per 32-bit VPU lane for the build,
        # and the int8 MXU path (2x bf16 rate) for the count matmul.
        ohT = (
            jax.lax.broadcasted_iota(jnp.int32, (HB, scq), 0) == hi[r : r + 1, :]
        ).astype(jnp.int8)
        wT = (
            jax.lax.broadcasted_iota(jnp.int32, (_Q, scq), 0) == lo[r : r + 1, :]
        ).astype(jnp.int8)
        acc += jax.lax.dot_general(
            ohT, wT, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
    out_ref[0] += acc


@functools.partial(
    jax.jit, static_argnames=("n_segments", "sc", "hb", "interpret")
)
def segment_count_onehot_batched(
    keys: jax.Array,  # (L, M) int32 in [0, n_segments)
    n_segments: int,
    sc: int = 2048,
    hb: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Dense (L, n_segments) int32 histogram on the MXU — the batched int8
    successor of :func:`segment_count_onehot` (device-trace-measured on
    v5e: 0.88 ms/level at M=524k, T=2^18 vs 1.64 ms + a 0.42 ms layout
    copy for the bf16 single-level kernel). Keys ride in their natural
    row-major layout (no (M, 1) relayout), the one-hot compares run at 4
    int8 lanes per 32-bit VPU lane, and the count matmul takes the int8
    MXU path (2x bf16 rate). Counts are exact int32."""
    L, M = keys.shape
    T_pad = -(-n_segments // _Q) * _Q
    H = T_pad // _Q
    HB = min(hb, H)
    n_hi = -(-H // HB)
    m_pad = (-M) % sc
    if m_pad:
        keys = jnp.concatenate(
            [keys, jnp.full((L, m_pad), n_hi * HB * _Q, jnp.int32)], axis=1
        )  # hi past every block -> zero one-hot row
    Mp = keys.shape[1]
    n_chunks = Mp // sc
    out = pl.pallas_call(
        functools.partial(_kernel_count_batched, HB=HB, sc=sc),
        grid=(L, n_hi, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 8, sc // 8), lambda l, b, c: (l, c, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, HB, _Q), lambda l, b, c: (l, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, n_hi * HB, _Q), jnp.int32),
        interpret=interpret,
    )(keys.reshape(L, Mp // (sc // 8), sc // 8))
    return out.reshape(L, -1)[:, :n_segments]


@functools.partial(
    jax.jit, static_argnames=("n_segments", "sc", "hb", "interpret")
)
def segment_count_onehot(
    keys: jax.Array,  # (M,) int32 in [0, n_segments)
    n_segments: int,
    sc: int = 2048,
    hb: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Dense (n_segments,) int32 histogram on the MXU (exact: bf16 one-hot
    entries summed in an fp32 accumulator; counts are integers well below
    2^24)."""
    dummy = jnp.zeros((keys.shape[0], 1), jnp.float32)
    out, T_pad = _run(keys, dummy, n_segments, 0, sc, hb, interpret)
    dense = out.reshape(-1)[:n_segments]
    return dense.astype(jnp.int32)
