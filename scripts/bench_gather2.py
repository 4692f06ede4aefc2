"""Gather bench v2 — defeat any caching/async artifacts: every iteration
uses a different index array (pre-staged on device) and the loop is timed
with a host scalar readback of a reduction over the output."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

L, F, T, N, C = 16, 2, 1 << 19, 1 << 18, 8
M = N * C


def timeit_sum(fn, arglists, n=6):
    # warmup on each distinct arg tuple
    s = 0.0
    for a in arglists[:2]:
        s += float(fn(*a))
    t0 = time.perf_counter()
    for i in range(n):
        s += float(fn(*arglists[i % len(arglists)]))
    dt = (time.perf_counter() - t0) / n * 1e3
    return dt, s


def main():
    key = jax.random.PRNGKey(0)
    table2d = jax.random.normal(key, (L * T, F))
    out_bytes = L * M * F * 4
    idxs = [
        jax.random.randint(jax.random.fold_in(key, 10 + i), (L * M,), 0, L * T, jnp.int32)
        for i in range(3)
    ]
    jax.block_until_ready(idxs)
    print(f"backend={jax.default_backend()} out={out_bytes/1e6:.0f}MB")

    f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
    dt, _ = timeit_sum(f, [(table2d, i) for i in idxs])
    print(f"take+sum 33.5M rows:        {dt:8.2f} ms  {out_bytes/1e9/(dt/1e3):6.0f} GB/s")

    # pure elementwise copy for bandwidth reference
    big = jax.random.normal(key, (L * M * F,))
    f2 = jax.jit(lambda x: jnp.sum(x * 1.0000001))
    dt, _ = timeit_sum(f2, [(big,)] * 3)
    print(f"elementwise mul+sum 268MB:  {dt:8.2f} ms  {2*out_bytes/1e9/(dt/1e3):6.0f} GB/s(r+w)")

    # in-situ-like: compute indices from float positions, then gather+blend
    pos = [
        jax.random.uniform(jax.random.fold_in(key, 20 + i), (N, 3))
        for i in range(3)
    ]

    from ngp_tpu.models.encodings import GridEncoding

    enc = GridEncoding(n_levels=L, n_features_per_level=F, log2_hashmap_size=19,
                       base_resolution=16, per_level_scale=1.5)
    params = enc.init(jax.random.PRNGKey(1))

    f3 = jax.jit(lambda p, x: jnp.sum(enc(p, x)))
    dt, _ = timeit_sum(f3, [(params, x) for x in pos])
    print(f"full encode fwd + sum:      {dt:8.2f} ms")

    # just the addressing math (indices_and_weights), no gather
    f4 = jax.jit(lambda x: jnp.sum(enc.indices_and_weights(x)[1]) +
                 jnp.sum(enc.indices_and_weights(x)[0]))
    dt, _ = timeit_sum(f4, [(x,) for x in pos])
    print(f"addressing math only (x2!): {dt:8.2f} ms")

    # gather with indices coming from addressing math, summed
    def gather_from_pos(p, x):
        idx, w = enc.indices_and_weights(x)
        flat = (jnp.arange(L, dtype=jnp.int32)[:, None, None] * T + idx).reshape(-1)
        return jnp.sum(jnp.take(p["table"].reshape(L * T, F), flat, axis=0))

    f5 = jax.jit(gather_from_pos)
    dt, _ = timeit_sum(f5, [(params, x) for x in pos])
    print(f"addressing + gather + sum:  {dt:8.2f} ms")


if __name__ == "__main__":
    main()
