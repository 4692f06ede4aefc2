"""Round-3 decision bench: decompose the hash-grid fwd/bwd cost at the
fork bench geometry (L=4, F=4, T=2^19, compact budget 163840).

METHODOLOGY (axon tunnel): ``jax.block_until_ready`` does NOT block on
this platform — only value fetches do. Every measurement here builds a
length-R dependency chain inside ONE jit (each round's input is perturbed
by the previous round's scalar digest, so nothing can be CSE'd or
reordered), fetches one scalar at the end, and subtracts the R=0 baseline.
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

N = 163840  # compacted budget
R = 8  # chain length


def chain_time(make_round, inputs, label, work_desc=""):
    """make_round(inputs, s, r) -> scalar contribution. Times R chained
    rounds inside one jit, minus the 1-round dispatch+fetch baseline."""

    def chained(inputs, n_rounds):
        s = jnp.float32(0.0)
        for r in range(n_rounds):
            s = s + make_round(inputs, s, r) * jnp.float32(1e-30)
        return s

    f1 = jax.jit(lambda *a: chained(a, 1))
    fR = jax.jit(lambda *a: chained(a, R))
    float(f1(*inputs))  # compile
    float(fR(*inputs))  # compile
    t0 = time.perf_counter()
    float(f1(*inputs))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fR(*inputs))
    full = time.perf_counter() - t0
    ms = (full - base) / (R - 1) * 1e3
    print(f"{label:<52s}: {ms:8.2f} ms  {work_desc}", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  chainR={R}", flush=True)

    # fetch latency floor
    x = jax.device_put(np.float32(1.0))
    f = jax.jit(lambda v: v + 1.0)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(f(x))
    print(f"scalar dispatch+fetch floor: {(time.perf_counter()-t0)/5*1e3:.2f} ms",
          flush=True)

    # ---- forward gather: rows/sec vs width/dtype  (perturb: add s to table)
    T = 1 << 19
    for rows, width, dtype in (
        (5242880, 4, jnp.float32),   # L4 C8 F4 fp32 (current)
        (5242880, 4, jnp.bfloat16),
        (2621440, 4, jnp.float32),   # C4 (simplex)
        (2621440, 8, jnp.bfloat16),  # C4 pairs, 2F bf16
        (2621440, 8, jnp.float32),
    ):
        tab = jax.device_put(rng.random((T, width), np.float32).astype(
            np.dtype(dtype.__name__ if dtype != jnp.bfloat16 else "float32")))
        if dtype == jnp.bfloat16:
            tab = tab.astype(jnp.bfloat16)
        idx = jax.device_put(rng.integers(0, T, rows).astype(np.int32))

        def rnd(inputs, s, r, rows=rows):
            tab, idx = inputs
            t2 = tab + s.astype(tab.dtype)
            g = jnp.take(t2, (idx + r) % T, axis=0, mode="clip")
            return jnp.sum(g.astype(jnp.float32))

        ms = chain_time(rnd, (tab, idx),
                        f"fwd take rows={rows} w={width} {dtype.__name__}",
                        f"{ms_to_ns(rows):.2f}" if False else
                        f"-> {5242880*4*4/1e9:.0f}")
    # note: ns/row printed below from ms manually

    # ---- sorts at candidate geometries (keys + payload cols)
    for lbl, L_, n_rows, n_payload in (
        ("sort cur: L4 rows=1.83M key+2pack", 4, 1835008, 2),
        ("sort big2: L2 rows=1.18M key+2pack", 2, 1179648, 2),
        ("sort big2: L2 rows=1.18M key+4pack", 2, 1179648, 4),
        ("sort simplex-nosent: L4 rows=655k key+2pack", 4, 655360, 2),
        ("sort 1col: L4 rows=1.83M key only", 4, 1835008, 0),
    ):
        keys = jax.device_put(
            rng.integers(0, 2 * T, (L_, n_rows)).astype(np.int32))
        pls = [
            jax.device_put(
                rng.integers(-2**31, 2**31 - 1, (L_, n_rows)).astype(np.int32))
            for _ in range(n_payload)
        ]

        def rnd(inputs, s, r):
            keys = inputs[0] + (s * 0).astype(jnp.int32) + r
            out = jax.lax.sort((keys, *inputs[1:]), num_keys=1,
                               is_stable=False)
            return jnp.sum(out[0][:, :8].astype(jnp.float32))

        chain_time(rnd, (keys, *pls), lbl)

    # ---- blocked cumsum at (4, 1.83M)
    from ngp_tpu.ops.scatter_free import blocked_cumsum

    xs = jax.device_put(rng.standard_normal((4, 1835008)).astype(np.float32))

    def rnd(inputs, s, r):
        return jnp.sum(blocked_cumsum(inputs[0] + s)[:, -8:])

    chain_time(rnd, (xs,), "blocked_cumsum (4, 1.83M)")

    def rnd(inputs, s, r):
        return jnp.sum(jnp.cumsum(inputs[0] + s, axis=-1)[:, -8:])

    chain_time(rnd, (xs,), "xla cumsum (4, 1.83M)")

    # ---- MXU one-hot segsum kernel (current impl) per level size
    from ngp_tpu.ops.pallas.segsum import segment_sum_onehot

    for T_, M_ in ((4920, 1310720), (35944, 1310720),
                   (131072, 1310720), (131072, 655360),
                   (65536, 1310720), (262144, 655360)):
        keys = jax.device_put(rng.integers(0, T_, M_).astype(np.int32))
        vals = jax.device_put(rng.standard_normal((M_, 4)).astype(np.float32))

        def rnd(inputs, s, r, T_=T_):
            k, v = inputs
            out = segment_sum_onehot(k, v + s, T_)
            return jnp.sum(out[:64])

        macs = T_ * 4 * M_ / 1e12
        chain_time(rnd, (keys, vals), f"mxu segsum T={T_} M={M_} F=4",
                   f"({macs:.2f} TMAC)")

    # ---- XLA scatter-add reference at M=1.31M
    keys = jax.device_put(rng.integers(0, T, 1310720).astype(np.int32))
    vals = jax.device_put(rng.standard_normal((1310720, 4)).astype(np.float32))

    def rnd(inputs, s, r):
        k, v = inputs
        out = jnp.zeros((T, 4), jnp.float32).at[k].add(v + s)
        return jnp.sum(out[:64])

    chain_time(rnd, (keys, vals), "xla scatter-add M=1.31M T=2^19 F=4")


def ms_to_ns(rows):
    return 0.0


if __name__ == "__main__":
    main()
