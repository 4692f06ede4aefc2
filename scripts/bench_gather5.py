"""Gather bench v5 — honest decision bench for the hash-encode fast path.

CRITICAL methodology note (learned the hard way): the axon tunnel dedupes
repeated executions with identical arguments — a timing loop over the same
(fn, args) pair reports fantasy numbers (a 1.1 TFLOP matmul "in" 60 µs).
Every iteration here therefore uses a DISTINCT pre-staged input; throughput
= wall over K distinct dispatches.

Decisions this feeds (ops/scatter_free.py, models/encodings.py):
  a. jnp.take ns/row vs row width  -> is gathering wider rows free?
  b. one-hot matmul gather cost vs table size -> MXU gather for small T?
  e. one-hot transpose matmul segment-sum vs table size -> MXU backward
     for small T (drops those levels out of the sort)?
  s. the batched sort at fork geometry -> current backward baseline.
"""

from __future__ import annotations

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

K = 8  # distinct staged inputs per measurement


def timeit_staged(fn, staged_args, warmup_args):
    """staged_args: list of K distinct arg tuples."""
    out = fn(*warmup_args)
    jax.block_until_ready(out)
    outs = []
    t0 = time.perf_counter()
    for a in staged_args:
        outs.append(fn(*a))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(staged_args) * 1e3


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    M = 1 << 21

    # -- a. take: ns/row vs row width
    T = 1 << 19
    for W in (2, 4, 8, 32, 128):
        tab = jax.device_put(rng.random((T, W), np.float32))
        idxs = [
            jax.device_put(rng.integers(0, T, M).astype(np.int32))
            for _ in range(K)
        ]
        w = jax.device_put(rng.random((M, 1), np.float32))
        f = jax.jit(lambda t, i, w: jnp.sum(jnp.take(t, i, axis=0) * w))
        ms = timeit_staged(f, [(tab, i, w) for i in idxs], (tab, idxs[0], w))
        print(f"a. take {M/1e6:.1f}M rows ({T},{W:3d}): {ms:8.2f} ms  "
              f"{ms*1e6/M:6.1f} ns/row  {M*W*4/ms/1e6:7.1f} GB/s")

    # -- c. one-hot matmul gather vs table size (bf16 table)
    for TS in (4096, 32768, 1 << 18):
        tabs = jax.device_put(
            rng.random((TS, 4), np.float32).astype(ml_dtypes.bfloat16)
        )
        idxs = [
            jax.device_put(rng.integers(0, TS, M).astype(np.int32))
            for _ in range(K)
        ]
        w = jax.device_put(rng.random((M, 1), np.float32))

        def ohg(t, i, w, TS=TS):
            oh = jax.nn.one_hot(i, TS, dtype=jnp.bfloat16)
            return jnp.sum(
                jnp.dot(oh, t, preferred_element_type=jnp.float32) * w
            )

        ms = timeit_staged(
            jax.jit(ohg), [(tabs, i, w) for i in idxs], (tabs, idxs[0], w)
        )
        print(f"c. 1hot-matmul {M/1e6:.1f}M x ({TS:6d},4): {ms:8.2f} ms  "
              f"{ms*1e6/M:6.1f} ns/row")

    # -- e. one-hot transpose segment sum vs table size
    for TS in (4096, 32768, 1 << 18):
        gs = [
            jax.device_put(
                rng.random((M, 4), np.float32).astype(ml_dtypes.bfloat16)
            )
            for _ in range(K)
        ]
        idxs = [
            jax.device_put(rng.integers(0, TS, M).astype(np.int32))
            for _ in range(K)
        ]
        w = jax.device_put(rng.random((TS, 1), np.float32))

        def seg(g, i, w, TS=TS):
            oh = jax.nn.one_hot(i, TS, dtype=jnp.bfloat16)
            return jnp.sum(
                jnp.dot(oh.T, g, preferred_element_type=jnp.float32) * w
            )

        ms = timeit_staged(
            jax.jit(seg), list(zip(gs, idxs, [w] * K)), (gs[0], idxs[0], w)
        )
        print(f"e. 1hotT-segsum {M/1e6:.1f}M -> ({TS:6d},4): {ms:8.2f} ms")

    # -- s. current sort-based backward at fork geometry (L=4 levels)
    from ngp_tpu.ops.scatter_free import batched_segment_sum

    L, Ms, TT = 4, 1 << 20, 1 << 19
    keys = [
        jax.device_put(rng.integers(0, TT, (L, Ms)).astype(np.int32))
        for _ in range(K)
    ]
    vals = [
        jax.device_put(rng.random((L, Ms, 4), np.float32)) for _ in range(K)
    ]
    f = jax.jit(
        lambda k, v: batched_segment_sum(k, v, TT).sum()
    )
    ms = timeit_staged(f, list(zip(keys, vals)), (keys[0], vals[0]))
    print(f"s. batched sort segsum ({L},{Ms/1e6:.1f}M)->{TT}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
