"""Gather bench v6 — device-trace-timed (the only trustworthy clock here).

Earlier gather benches (v1-v5) timed with ``block_until_ready``, which does
NOT block on the axon tunnel — their ns/row numbers disagree with the
device-side op durations of the real train step by 5-7x. This bench runs
each candidate under ``jax.profiler.trace`` and reports the *device* time
of the gather op itself.

Decisions this feeds:
  - forward dup-gather row format: f32[.,16] (64 B) vs packed bf16-in-int32
    [.,8] (32 B) vs [.,4] (16 B)
  - backward run-end gather width
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def device_op_times(tracedir):
    files = sorted(glob.glob(os.path.join(tracedir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    per = collections.Counter()
    for e in ev:
        if (
            e.get("ph") == "X"
            and tnames.get((e["pid"], e["tid"])) == "XLA Ops"
            and "TPU" in pnames.get(e["pid"], "")
        ):
            per[e["name"]] += e["dur"]
    return per


def traced(fn, args, label, iters=4, key_ops=()):
    """Run fn(args) iters times under trace; print total device ms/iter and
    the matching key ops."""
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    tracedir = f"/tmp/gb6_{label}"
    os.system(f"rm -rf {tracedir}")
    outs = []
    with jax.profiler.trace(tracedir):
        for _ in range(iters):
            args = fn(*args)  # chain outputs -> inputs (defeats dedupe)
        jax.tree.map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))[()])
            if x.ndim == 0 else float(x.reshape(-1)[0]), args[0])
    per = device_op_times(tracedir)
    total = sum(per.values()) / iters / 1e3
    print(f"{label:>28}: total {total:8.3f} ms/iter", flush=True)
    for n, us in per.most_common(4):
        print(f"                              {us/iters/1e3:8.3f} ms  {n[:60]}")
    return total


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    Lx = 8
    T = 1 << 18
    N = 1 << 17  # samples; rows gathered = Lx*N = 2^20
    LT = Lx * T

    idx0 = jax.device_put(
        rng.integers(0, LT, (Lx * N,)).astype(np.int32))

    # table variants
    tab_f32_16 = jax.device_put(rng.random((LT, 16), np.float32))
    tab_i32_8 = jax.device_put(rng.integers(-2**31, 2**31 - 1, (LT, 8)).astype(np.int32))
    tab_i32_4 = jax.device_put(rng.integers(-2**31, 2**31 - 1, (LT, 4)).astype(np.int32))
    tab_f32_8 = jax.device_put(rng.random((LT, 8), np.float32))
    tab_f32_4 = jax.device_put(rng.random((LT, 4), np.float32))
    tab_bf16_16 = tab_f32_16.astype(jnp.bfloat16)

    def mk(table):
        @jax.jit
        def f(idx, t):
            rows = jnp.take(t, idx, axis=0, mode="clip")
            # fold output back into an index-like array so iterations chain
            s = jnp.sum(rows.astype(jnp.float32), axis=-1)
            nidx = (idx + s.astype(jnp.int32) + 1) % LT
            return (nidx, t)
        return f

    for label, tab in [
        ("take f32[2^21,16] 64B", tab_f32_16),
        ("take f32[2^21,8] 32B", tab_f32_8),
        ("take f32[2^21,4] 16B", tab_f32_4),
        ("take i32[2^21,8] 32B", tab_i32_8),
        ("take i32[2^21,4] 16B", tab_i32_4),
        ("take bf16[2^21,16] 32B", tab_bf16_16),
    ]:
        f = mk(tab)
        traced(lambda i, t: f(i, t), (idx0, tab), label.replace(" ", "_").replace("[", "").replace("]", "").replace(",", "_").replace("^", ""))


if __name__ == "__main__":
    main()


def variants2():
    rng = np.random.default_rng(0)
    Lx, T, N = 8, 1 << 18, 1 << 17
    LT = Lx * T
    M = Lx * N
    idx0 = jax.device_put(rng.integers(0, LT, (M,)).astype(np.int32))
    idx_sorted = jax.device_put(np.sort(rng.integers(0, LT, (M,)).astype(np.int32)))

    # -- transposed table, gather along minor (lane) axis
    tab_T16 = jax.device_put(rng.random((16, LT), np.float32))
    tab_T4 = jax.device_put(rng.random((4, LT), np.float32))

    def mkT(tab):
        @jax.jit
        def f(idx, t):
            rows = jnp.take(t, idx, axis=1, mode="clip")  # (W, M)
            s = jnp.sum(rows, axis=0)
            nidx = (idx + s.astype(jnp.int32) + 1) % LT
            return (nidx, t)
        return f

    for label, tab in [("takeT f32[16,2^21]", tab_T16), ("takeT f32[4,2^21]", tab_T4)]:
        f = mkT(tab)
        traced(lambda i, t: f(i, t), (idx0, tab), label.replace(" ", "_").replace("[", "").replace("]", "").replace(",", "_").replace("^", ""))

    # -- sorted indices (locality)
    tab16 = jax.device_put(rng.random((LT, 16), np.float32))

    @jax.jit
    def fs(idx, t):
        rows = jnp.take(t, idx, axis=0, mode="clip")
        s = jnp.sum(rows, axis=-1)
        nidx = jnp.sort((idx + s.astype(jnp.int32) + 1) % LT)
        return (nidx, t)

    traced(lambda i, t: fs(i, t), (idx_sorted, tab16), "take_sorted_f32_16_64B")

    # -- one-hot matmul gather crossover: out = onehot(idx) @ tab, per level
    for log2t in (12, 13, 14):
        Ts = 1 << log2t
        tab = jax.device_put(rng.random((Ts, 128), np.float32).astype(np.float32))
        idxs = jax.device_put(rng.integers(0, Ts, (1 << 17,)).astype(np.int32))

        @jax.jit
        def fo(idx, t):
            oh = (idx[:, None] == jnp.arange(t.shape[0])[None, :]).astype(jnp.bfloat16)
            rows = jnp.dot(oh, t.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            s = jnp.sum(rows, axis=-1)
            nidx = (idx + s.astype(jnp.int32) + 1) % t.shape[0]
            return (nidx, t)

        traced(lambda i, t: fo(i, t), (idxs, tab), f"onehot_T2^{log2t}_F128_N2^17")


if __name__ == "__main__" and os.environ.get("GB6_V2"):
    variants2()
