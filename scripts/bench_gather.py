"""Microbenchmark: random table-gather strategies on TPU.

The hash-encoding forward is 33.5M random row lookups (N=2^18 samples x 16
levels x 8 corners) from a (8.4M, 2) f32 table. XLA's default lowering
measured ~283 ms in-situ — ~200x off HBM speed-of-light. This sweeps
formulations to find the fast path.
"""

from __future__ import annotations

import os
import sys
import time

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
N = 1 << 18
C = 8
M = N * C


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    return dt


def main():
    key = jax.random.PRNGKey(0)
    table2d = jax.random.normal(key, (L * T, F))
    table_lvl = table2d.reshape(L, T, F)
    table_flat = table2d.reshape(-1)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (L, M), 0, T, jnp.int32)
    idx_glob = (idx + jnp.arange(L, dtype=jnp.int32)[:, None] * T).reshape(-1)
    out_bytes = L * M * F * 4
    print(f"backend={jax.default_backend()}  gathers={L*M/1e6:.1f}M rows  "
          f"out={out_bytes/1e6:.0f} MB")

    def report(name, ms):
        print(f"{name:44s} {ms:8.2f} ms   {out_bytes/1e9/(ms/1e3):6.1f} GB/s(out)")

    # a) row take from (L*T, F)
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    report("a take rows (L*T,F)[flat_idx]", timeit(f, table2d, idx_glob))

    # b) flat element gather, 2 gathers
    f = jax.jit(lambda t, i: jnp.stack([jnp.take(t, i * 2), jnp.take(t, i * 2 + 1)], -1))
    report("b flat take x2 (elementwise)", timeit(f, table_flat, idx_glob))

    # c) per-level batched via take_along_axis
    f = jax.jit(
        lambda t, i: jnp.take_along_axis(t, i[:, :, None], axis=1)
    )
    report("c take_along_axis (L,T,F) by (L,M,1)", timeit(f, table_lvl, idx))

    # d) sorted indices (locality test) — same op as (a), keys pre-sorted
    idx_sorted = jnp.sort(idx, axis=1)
    idx_sorted_glob = (
        idx_sorted + jnp.arange(L, dtype=jnp.int32)[:, None] * T
    ).reshape(-1)
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    report("d take rows, sorted idx", timeit(f, table2d, idx_sorted_glob))

    # e) bf16 table rows
    tb = table2d.astype(jnp.bfloat16)
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    report("e take rows bf16 table", timeit(f, tb, idx_glob))

    # f) rows of 8 features (pack 4 levels' features in one row): fewer,
    #    wider gathers — (T, 8) table, M/4 lookups emulation
    t8 = jax.random.normal(key, (T, 8))
    i8 = idx[0][: M]
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    report("f take 2M rows of (T,8)", timeit(f, t8, i8))

    # g) one-hot matmul gather for a small level (T=4096)
    tsmall = jax.random.normal(key, (4096, F))
    ismall = jax.random.randint(jax.random.fold_in(key, 2), (M,), 0, 4096, jnp.int32)

    def onehot_gather(t, i):
        oh = (i[:, None] == jnp.arange(4096, dtype=jnp.int32)[None, :]).astype(
            jnp.bfloat16
        )
        return jnp.dot(oh, t.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    f = jax.jit(onehot_gather)
    report("g one-hot matmul 2M x (4096,F)", timeit(f, tsmall, ismall, n=3))

    # h) take rows from a VMEM-sized table (4MB): is XLA faster when the
    #    table could be cached on-chip?
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    report("h take 2M rows of (T,2) 4MB table", timeit(f, table_lvl[0], idx[0]))

    # i) same but tiny table (64KB)
    ttiny = jax.random.normal(key, (2048, F))
    itiny = jax.random.randint(jax.random.fold_in(key, 3), (M,), 0, 2048, jnp.int32)
    report("i take 2M rows of (2048,2) 16KB table", timeit(f, ttiny, itiny))

    # j) scan over levels with lax.map (locality per level)
    def one_level(args):
        t, i = args
        return jnp.take(t, i, axis=0)

    f = jax.jit(lambda t, i: jax.lax.map(one_level, (t, i)))
    report("j lax.map per-level take", timeit(f, table_lvl, idx))

    # k) dynamic_slice loop emulation is hopeless; skip.

    # l) full fwd grid_gather_blend for context
    from ngp_tpu.models.encodings import grid_gather_blend

    w = jax.random.uniform(jax.random.fold_in(key, 4), (L, N, C))
    idxw = jax.random.randint(jax.random.fold_in(key, 5), (L, N, C), 0, T, jnp.int32)
    f = jax.jit(grid_gather_blend)
    report("l grid_gather_blend fwd (in-situ op)", timeit(f, table_lvl, idxw, w, n=3))


if __name__ == "__main__":
    main()
