"""MXU one-hot segment sum — a Pallas TPU kernel for the hash-grid
gradient accumulation.

The hash-grid backward must compute ``dense[t, f] = Σ_{m: keys[m]=t}
vals[m, f]`` (the reference scatter-adds this with fp16 atomics — tcnn's
grid backward, SURVEY §2.10). TPU has no fast scatter, and Mosaic's
``dynamic_gather`` is vreg-local, so neither a scatter nor an in-VMEM
gather kernel is available. What the TPU *does* have is a monstrous MXU —
so this kernel reformulates the segment sum as a chain of one-hot
matmuls with a kron-factored key:

    hi = key >> 7, lo = key & 127
    acc[hi, f·128 + lo] += Σ_s onehotᵀ(hi_s)[hi] · (onehot(lo_s)[lo] · v[s, f])

The (T/128, 128·F) fp32 accumulator lives in VMEM across the sequential
grid (4 MB at T = 2^19, F = 2); each grid step streams one chunk of
(keys, vals), builds the two one-hot factors with iota compares (VPU),
and issues one (T/128 × S_c) @ (S_c × 128·F) bf16 matmul. Total MACs =
M·T·F regardless of factorization — ~1.4 T-MAC at M = 1.3M, T = 2^19,
F = 2, i.e. single-digit milliseconds of MXU time, with **zero** HBM
traffic beyond streaming the inputs once. Profitable for levels whose
table is small enough (MACs ∝ T); the sort-based path
(``ops/scatter_free.py``) stays the fallback for larger tables.

No dynamic indexing anywhere — compiles with stock Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q = 128  # lo-factor width = lane count


def _kernel(keys_ref, vals_ref, out_ref, *, H: int, F: int, sc: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    k = keys_ref[:]  # (sc, 1) int32
    hi = k >> 7
    lo = k & (_Q - 1)

    # transposed hi one-hot: (H, sc); padded keys carry hi >= H -> all-zero
    ohT = (
        jax.lax.broadcasted_iota(jnp.int32, (H, sc), 0)
        == jnp.transpose(hi, (1, 0))
    ).astype(jnp.bfloat16)
    # lo one-hot scaled by each feature column: (sc, F*128), f-major blocks
    lo1h = jax.lax.broadcasted_iota(jnp.int32, (sc, _Q), 1) == lo
    w = jnp.concatenate(
        [
            jnp.where(lo1h, vals_ref[:, f : f + 1], 0.0).astype(jnp.bfloat16)
            for f in range(F)
        ],
        axis=1,
    )
    out_ref[:] += jnp.dot(ohT, w, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_segments", "sc", "interpret"))
def segment_sum_onehot(
    keys: jax.Array,  # (M,) int32 in [0, n_segments)
    vals: jax.Array,  # (M, F) float
    n_segments: int,
    sc: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Dense (n_segments, F) float32 segment sum on the MXU."""
    M, F = vals.shape
    T_pad = -(-n_segments // _Q) * _Q
    H = T_pad // _Q
    m_pad = (-M) % sc
    if m_pad:
        keys = jnp.concatenate(
            [keys, jnp.full((m_pad,), T_pad, jnp.int32)]
        )  # hi = H -> zero one-hot row
        vals = jnp.concatenate([vals, jnp.zeros((m_pad, F), vals.dtype)])
    n_chunks = keys.shape[0] // sc

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, F=F, sc=sc),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((sc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (H, F * _Q), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, F * _Q), jnp.float32),
        interpret=interpret,
    )(keys[:, None].astype(jnp.int32), vals.astype(jnp.float32))

    # (H, F, 128) -> (H, 128, F) -> (T_pad, F); rows are hi*128 + lo
    dense = jnp.transpose(out.reshape(H, F, _Q), (0, 2, 1)).reshape(T_pad, F)
    return dense[:n_segments]
