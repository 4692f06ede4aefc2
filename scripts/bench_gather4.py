"""Gather bench v4 — the decision bench for the hash-encode fast path.

Measures on real hardware (args passed as device arrays, never closures —
the tunnel's remote compiler rejects big inlined constants):

  a. jnp.take rows/s vs row width (16B .. 512B rows)
  b. sorted vs unsorted indices
  c. one-hot matmul gather (fused iota-compare @ MXU) vs table size
  d. weighted 8-hot matmul (gather+trilinear-blend in one matmul)
  e. one-hot-transpose matmul segment-sum (the backward) vs table size
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print("backend:", jax.default_backend())
    M = 1 << 21  # rows to gather (~fork level M = 1.3M, rounded up)

    # -- a. row width scaling
    T = 1 << 19
    for W in (4, 8, 32, 128):
        tab = jax.device_put(np.random.rand(T, W).astype(np.float32))
        idx = jax.device_put(
            np.random.randint(0, T, (M,), dtype=np.int32)
        )
        w = jax.device_put(np.random.rand(M, 1).astype(np.float32))
        f = jax.jit(lambda t, i, w: jnp.sum(jnp.take(t, i, axis=0) * w))
        ms = timeit(f, tab, idx, w)
        print(f"a. take {M/1e6:.1f}M rows of ({T},{W:3d}) f32: {ms:7.2f} ms "
              f"{M/ms/1e6:7.1f} Mrows/s  {M*W*4/ms/1e6:7.1f} GB/s")

    # -- b. sorted indices
    tab = jax.device_put(np.random.rand(T, 4).astype(np.float32))
    idx_s = jax.device_put(
        np.sort(np.random.randint(0, T, (M,), dtype=np.int32))
    )
    ws = jax.device_put(np.random.rand(M, 1).astype(np.float32))
    f = jax.jit(lambda t, i, w: jnp.sum(jnp.take(t, i, axis=0) * w))
    ms = timeit(f, tab, idx_s, ws)
    print(f"b. take sorted {M/1e6:.1f}M of ({T},4):        {ms:7.2f} ms "
          f"{M/ms/1e6:7.1f} Mrows/s")

    # -- c. one-hot matmul gather
    for TS in (4096, 32768, 1 << 18):
        tabs = jax.device_put(np.random.rand(TS, 4).astype(ml_dtypes.bfloat16))
        idxs = jax.device_put(np.random.randint(0, TS, (M,), dtype=np.int32))

        def ohg(t, i, TS=TS):
            oh = jax.nn.one_hot(i, TS, dtype=jnp.bfloat16)
            return jnp.sum(
                jnp.dot(oh, t, preferred_element_type=jnp.float32)
            )

        ms = timeit(jax.jit(ohg), tabs, idxs, n=5)
        print(f"c. one-hot matmul {M/1e6:.1f}M x ({TS:6d},4) bf16: {ms:7.2f} ms "
              f"{M/ms/1e6:7.1f} Mrows/s")

    # -- d. weighted 8-hot matmul: gather + trilinear blend fused.
    # N samples, 8 corner ids + weights -> (N, T) 8-hot @ (T, F)
    N = 1 << 18
    for TS in (4096, 32768):
        tabs = jax.device_put(np.random.rand(TS, 4).astype(ml_dtypes.bfloat16))
        cid = jax.device_put(np.random.randint(0, TS, (N, 8), np.int32))
        cw = jax.device_put(np.random.rand(N, 8).astype(np.float32))

        def w8(t, i, w, TS=TS):
            # 8 fusable single-hot matmuls (never materialize (N,8,TS))
            acc = 0.0
            for c in range(8):
                oh = jax.nn.one_hot(i[:, c], TS, dtype=jnp.bfloat16)
                acc = acc + jnp.dot(
                    oh, t, preferred_element_type=jnp.float32
                ) * w[:, c:c+1]
            return jnp.sum(acc)

        ms = timeit(jax.jit(w8), tabs, cid, cw, n=5)
        print(f"d. weighted-8hot {N/1e6:.2f}M x ({TS:6d},4):      {ms:7.2f} ms "
              f"(vs {N*8/1e6:.1f}M row-gathers)")

    # -- e. backward: one-hot transpose segment-sum vs table size
    for TS in (4096, 32768, 1 << 18):
        g = jax.device_put(np.random.rand(M, 4).astype(ml_dtypes.bfloat16))
        idxs = jax.device_put(np.random.randint(0, TS, (M,), dtype=np.int32))

        def seg(gv, i, TS=TS):
            oh = jax.nn.one_hot(i, TS, dtype=jnp.bfloat16)  # (M, TS)
            return jnp.sum(
                jnp.dot(oh.T, gv, preferred_element_type=jnp.float32)
            )

        ms = timeit(jax.jit(seg), g, idxs, n=5)
        print(f"e. one-hotT segsum {M/1e6:.1f}M -> ({TS:6d},4):   {ms:7.2f} ms")


if __name__ == "__main__":
    main()
