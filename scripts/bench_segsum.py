"""Microbenchmark: hash-grid backward segment-sum strategies on TPU.

The round-1 backward (ops/scatter_free.dense_segment_sum) costs two global
stable bitonic sorts over M = N·L·C ≈ 33.5M elements (~500 ms measured).
This compares candidate replacements at the real batch geometry:

  v1  global 2-sort slot trick (current)
  v2  per-level batched unstable sort (3 f32 operands) + searchsorted extract
  v3  per-level batched sort with bf16-packed payload (2 operands) + extract
  v4  forward-gather reference point (jnp.take of the same element count)
  v5  xla scatter-add reference point (small subset, extrapolated)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

L, F = 16, 2
T = 1 << 19
N_SAMPLES = 1 << 18
C = 8
M = N_SAMPLES * C  # per-level entries


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


@jax.jit
def v1_global(keys_flat, vals_flat):
    from ngp_tpu.ops.scatter_free import dense_segment_sum

    return dense_segment_sum(keys_flat, vals_flat, L * T)


def _extract(ks, cs0, cs1):
    """dense[t] = S(t) - S(t-1), S(t) = cs[searchsorted(ks, t, 'right')-1]."""
    tq = jnp.arange(T, dtype=jnp.int32)
    p = jnp.searchsorted(ks, tq, side="right") - 1
    ok = p >= 0
    pc = jnp.maximum(p, 0)
    s0 = jnp.where(ok, cs0[pc], 0.0)
    s1 = jnp.where(ok, cs1[pc], 0.0)
    d0 = jnp.diff(s0, prepend=0.0)
    d1 = jnp.diff(s1, prepend=0.0)
    return jnp.stack([d0, d1], -1)


@jax.jit
def v2_batched_f32(keys, v0, v1):
    ks, s0, s1 = jax.lax.sort((keys, v0, v1), num_keys=1, is_stable=False)
    cs0 = jnp.cumsum(s0, axis=1)
    cs1 = jnp.cumsum(s1, axis=1)
    return jax.vmap(_extract)(ks, cs0, cs1)


@jax.jit
def v3_batched_packed(keys, v0, v1):
    vb = jnp.stack([v0.astype(jnp.bfloat16), v1.astype(jnp.bfloat16)], -1)
    payload = jax.lax.bitcast_convert_type(vb, jnp.int32)  # (L, M)
    ks, sp = jax.lax.sort((keys, payload), num_keys=1, is_stable=False)
    sv = jax.lax.bitcast_convert_type(sp, jnp.bfloat16)  # (L, M, 2)
    cs0 = jnp.cumsum(sv[..., 0].astype(jnp.float32), axis=1)
    cs1 = jnp.cumsum(sv[..., 1].astype(jnp.float32), axis=1)
    return jax.vmap(_extract)(ks, cs0, cs1)


@jax.jit
def v3b_sort_only(keys, v0, v1):
    vb = jnp.stack([v0.astype(jnp.bfloat16), v1.astype(jnp.bfloat16)], -1)
    payload = jax.lax.bitcast_convert_type(vb, jnp.int32)
    ks, sp = jax.lax.sort((keys, payload), num_keys=1, is_stable=False)
    return ks[:, ::1024], sp[:, ::1024]


@jax.jit
def v2b_cumsum_only(sv):
    return jnp.cumsum(sv, axis=1)[:, -1]


@jax.jit
def v2c_extract_only(ks, cs0, cs1):
    return jax.vmap(_extract)(ks, cs0, cs1)


@jax.jit
def v4_gather(table_flat, keys_flat):
    return jnp.take(table_flat, keys_flat, axis=0)


@jax.jit
def v5_scatter(keys_small, vals_small):
    out = jnp.zeros((L * T, F), jnp.float32)
    return out.at[keys_small].add(vals_small)


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (L, M), 0, T, dtype=jnp.int32)
    v0 = jax.random.normal(jax.random.fold_in(key, 1), (L, M))
    v1 = jax.random.normal(jax.random.fold_in(key, 2), (L, M))
    keys_flat = (keys + jnp.arange(L, dtype=jnp.int32)[:, None] * T).reshape(-1)
    vals_flat = jnp.stack([v0, v1], -1).reshape(-1, F)
    table_flat = jax.random.normal(jax.random.fold_in(key, 3), (L * T, F))

    print(f"backend={jax.default_backend()}  M/level={M}  L={L}  T={T}")

    t = timeit(v4_gather, table_flat, keys_flat)
    print(f"v4 forward-gather 33.5M rows:      {t:8.1f} ms")

    # correctness vs v1 on small problem first
    kk = keys[:, :4096]
    r2 = v2_batched_f32(kk, v0[:, :4096], v1[:, :4096])
    kkf = (kk + jnp.arange(L, dtype=jnp.int32)[:, None] * T).reshape(-1)
    r1 = v1_global(kkf, jnp.stack([v0[:, :4096], v1[:, :4096]], -1).reshape(-1, F))
    np.testing.assert_allclose(
        np.asarray(r2).reshape(-1, F), np.asarray(r1), rtol=1e-4, atol=1e-3
    )
    print("v2 == v1 on small problem: OK")

    t1 = timeit(v1_global, keys_flat, vals_flat, n=3)
    print(f"v1 global 2-sort slot (current):   {t1:8.1f} ms")
    t2 = timeit(v2_batched_f32, keys, v0, v1, n=3)
    print(f"v2 batched f32 + searchsorted:     {t2:8.1f} ms")
    t3 = timeit(v3_batched_packed, keys, v0, v1, n=3)
    print(f"v3 batched bf16-packed + extract:  {t3:8.1f} ms")
    t3b = timeit(v3b_sort_only, keys, v0, v1, n=3)
    print(f"v3b   sort only (packed):          {t3b:8.1f} ms")

    ks, s0, s1 = jax.jit(
        lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1, is_stable=False)
    )(keys, v0, v1)
    tc = timeit(v2b_cumsum_only, s0)
    print(f"v2b   cumsum only (one (L,M)):     {tc:8.1f} ms")
    cs0 = jnp.cumsum(s0, axis=1)
    cs1 = jnp.cumsum(s1, axis=1)
    te = timeit(v2c_extract_only, ks, cs0, cs1)
    print(f"v2c   searchsorted extract only:   {te:8.1f} ms")

    ksm = 1 << 20
    t5 = timeit(
        v5_scatter, keys_flat[:ksm], vals_flat[:ksm], n=2, warmup=1
    )
    print(f"v5 xla scatter-add ({ksm/1e6:.1f}M rows):  {t5:8.1f} ms "
          f"(→ {t5 * (L * M) / ksm:.0f} ms at full size)")


if __name__ == "__main__":
    main()
