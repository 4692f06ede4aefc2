"""Microbenchmark: hash-grid backward run-extraction strategies on the
real chip, at the production pairs-backward geometry (tpu tier, fox bench:
6 sort-path levels, M = 163840 compacted samples x 4 pair keys, 2F=4
payload columns, T = 2^18 table rows).

Timing discipline (docs/PERF.md): the device tunnel dedupes identical
dispatches and makes block_until_ready a no-op, so every variant runs as
an evolving-state chain (the payload depends on the previous output) with
ONE trailing value fetch.

Usage: python scripts/bench_segsum_sorted.py [--iters 20]
"""

from __future__ import annotations

import argparse
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

L, F = 6, 4
T = 1 << 18
M = 163840 * 4  # compacted samples x pair keys (bench steady state)


def chain_time(fn, keys, vals, iters, warmup=6):
    """Two timed windows; returns (settled, first) — a fresh executable
    runs ~5x slow for its first tens of seconds on the tunnel
    (docs/PERF.md), so the first window is reported but not trusted."""
    acc = jnp.float32(0.0)
    for w in range(warmup):
        acc = acc + fn(keys, vals, acc * 1e-30 - w)
    float(acc)
    out = []
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            acc = acc + fn(keys, vals, acc * 1e-30 + i + w * iters)
        float(acc)
        out.append((time.perf_counter() - t0) / iters * 1e3)
    return out[1], out[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from ngp_tpu.ops import scatter_free as sf

    rng = np.random.default_rng(0)
    # hash-key distribution: near-uniform over the table (the additive
    # hash jumbles positions), which is the production case
    keys = jnp.asarray(rng.integers(0, T, (L, M)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(L, M, F)).astype(np.float32))
    sizes = [T] * L
    print(f"backend={jax.default_backend()} L={L} M={M} F={F} T={T}",
          flush=True)

    def sort_only(keys, vals, t):
        cols = sf._pack_bf16_pairs([vals[:, :, f] + t * 1e-30 for f in range(F)])
        s = jax.lax.sort((keys, *cols), num_keys=1, is_stable=False)
        return sum(jnp.sum(c[:, ::65537].astype(jnp.float32)) for c in s[1:])

    def full(keys, vals, t):
        d = sf._segment_sum_sort_hist(
            keys, vals + t * 1e-30, sizes, T, "bfloat16"
        )
        return jnp.sum(d[:, ::4097])

    ms, ms1 = chain_time(jax.jit(sort_only), keys, vals, args.iters)
    print(f"{'sort_only':>16}: {ms:7.2f} ms  (first window {ms1:.2f})",
          flush=True)

    for strat in ("cumsum_hist", "sorted_blocks"):
        os.environ["NGP_TPU_SEGSUM_HIST"] = strat

        # distinct closure per strategy: jax.jit of the SAME function
        # object shares one trace cache, which would silently reuse the
        # first strategy's trace for the second
        def full_s(keys, vals, t, _full=full, _s=strat):
            return _full(keys, vals, t)

        ms, ms1 = chain_time(jax.jit(full_s), keys, vals, args.iters)
        print(f"{strat:>16}: {ms:7.2f} ms  (first window {ms1:.2f})",
              flush=True)
        os.environ.pop("NGP_TPU_SEGSUM_HIST", None)

    # concentration robustness: all keys inside one RB block
    keys_c = jnp.asarray(
        (rng.integers(0, 1024, (L, M)) + 131072).astype(np.int32)
    )
    os.environ["NGP_TPU_SEGSUM_HIST"] = "sorted_blocks"

    def full_c(keys, vals, t):
        return full(keys, vals, t)

    ms, ms1 = chain_time(jax.jit(full_c), keys_c, vals,
                         max(args.iters // 2, 4))
    print(f"{'sorted_1block':>16}: {ms:7.2f} ms  (first window {ms1:.2f})",
          flush=True)
    os.environ.pop("NGP_TPU_SEGSUM_HIST", None)


if __name__ == "__main__":
    main()
