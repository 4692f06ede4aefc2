"""Gather bench v3 — accurate cost model for TPU table gathers.

Every measurement chains K=8 applications of the op device-side via
lax.scan over pre-staged distinct inputs, with a final scalar readback, so
the ~35 ms tunnel dispatch overhead is amortized/subtracted. Goal: find a
hash-encoding gather formulation within ~10x of HBM speed-of-light.
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

K = 8  # chained applications per timed call


def timeit_chain(make_op, stacked_args, n=4):
    """make_op(args...)->scalar; stacked_args pytree with leading dim K."""

    @jax.jit
    def chained(stacked):
        def body(c, a):
            return c + make_op(*a), None

        s, _ = jax.lax.scan(body, 0.0, stacked)
        return s

    s = float(chained(stacked_args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(n):
        s += float(chained(stacked_args))
    dt = (time.perf_counter() - t0) / n
    return dt / K * 1e3, s  # ms per single op application


def overhead():
    @jax.jit
    def empty(x):
        return x * 1.000001

    x = jnp.float32(1.0)
    float(empty(x))
    t0 = time.perf_counter()
    for _ in range(8):
        x = empty(x)
        float(x)
    return (time.perf_counter() - t0) / 8 * 1e3


def main():
    key = jax.random.PRNGKey(0)
    oh = overhead()
    print(f"backend={jax.default_backend()}  dispatch overhead ~{oh:.1f} ms "
          f"(already amortized /{K} by chaining)")

    def report(name, ms, nbytes):
        print(f"{name:48s} {ms:8.2f} ms   {nbytes/1e9/(ms/1e3):7.1f} GB/s")

    # ---- cost vs row width: take M rows from (R, F) ----
    M = 1 << 23  # 8.4M rows = fork-config L4 geometry
    for F in (2, 4, 8, 32):
        R = (1 << 21)
        tab = jax.random.normal(key, (R, F))
        idx = jax.random.randint(key, (K, M), 0, R, jnp.int32)
        ms, _ = timeit_chain(lambda i, t=tab: jnp.sum(jnp.take(t, i, axis=0)), (idx,))
        report(f"take {M>>20}M rows of (2^21,{F}) f32", ms, M * F * 4)

    # wide rows, fewer of them (brick layout probe)
    for M2, F in ((1 << 20, 256), (1 << 18, 1024)):
        R = 1 << 16
        tab = jax.random.normal(key, (R, F))
        idx = jax.random.randint(key, (K, M2), 0, R, jnp.int32)
        ms, _ = timeit_chain(lambda i, t=tab: jnp.sum(jnp.take(t, i, axis=0)), (idx,))
        report(f"take {M2>>20 or M2>>10}{'M' if M2>=1<<20 else 'K'} rows of (2^16,{F}) f32", ms, M2 * F * 4)

    # bf16 narrow
    tab = jax.random.normal(key, (1 << 21, 2)).astype(jnp.bfloat16)
    idx = jax.random.randint(key, (K, M), 0, 1 << 21, jnp.int32)
    ms, _ = timeit_chain(
        lambda i, t=tab: jnp.sum(jnp.take(t, i, axis=0).astype(jnp.float32)), (idx,)
    )
    report(f"take {M>>20}M rows of (2^21,2) bf16", ms, M * 2 * 2)

    # ---- gather along LAST axis (lane gather): out[m] = tabT[idx[m]] ----
    tabT = jax.random.normal(key, (2, 1 << 21))
    ms, _ = timeit_chain(lambda i, t=tabT: jnp.sum(jnp.take(t, i, axis=1)), (idx,))
    report(f"take axis=1 {M>>20}M cols of (2,2^21)", ms, M * 2 * 4)

    # ---- dynamic_gather shape at XLA level: take_along_axis axis 0 ----
    for S in (8, 64, 512, 4096):
        op = jax.random.normal(key, (S, 128))
        ii = jax.random.randint(key, (K, S, 128), 0, S, jnp.int32)
        nrep = max(1, (1 << 20) // (S * 128))

        def tga(i, t=op, nrep=nrep):
            def body(c, j):
                return c + jnp.sum(jnp.take_along_axis(t, (i + j) % t.shape[0], axis=0)), None

            s, _ = jax.lax.scan(body, 0.0, jnp.arange(nrep))
            return s

        ms, _ = timeit_chain(tga, (ii,))
        per_el = ms / nrep / (S * 128) * 1e6
        print(f"take_along_axis ax0 (S={S:5d},128) x{nrep:5d} reps   "
              f"{ms:8.2f} ms  {per_el:8.2f} ns/el")

    # ---- one-hot matmul gather, bf16, small tables ----
    for TS in (4096, 32768):
        M3 = 1 << 21
        tsmall = jax.random.normal(key, (TS, 4)).astype(jnp.bfloat16)
        ism = jax.random.randint(key, (K, M3), 0, TS, jnp.int32)

        def ohg(i, t=tsmall, TS=TS):
            ohm = (i[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)).astype(
                jnp.bfloat16
            )
            return jnp.sum(
                jnp.dot(ohm, t, preferred_element_type=jnp.float32)
            )

        ms, _ = timeit_chain(ohg, (ism,), n=2)
        report(f"one-hot matmul 2M x ({TS},4) bf16", ms, M3 * 4 * 4)

    # ---- full L4F4 fork-geometry encode-like gather: 2^18*4*8 rows (T,4) ----
    N = 1 << 18
    Mf = N * 4 * 8
    tabf = jax.random.normal(key, (4 << 19, 4))
    idxf = jax.random.randint(key, (K, Mf), 0, 4 << 19, jnp.int32)
    ms, _ = timeit_chain(lambda i, t=tabf: jnp.sum(jnp.take(t, i, axis=0)), (idxf,))
    report("L4F4 fwd gather 8.4M rows of (2^21,4)", ms, Mf * 4 * 4)


if __name__ == "__main__":
    main()
