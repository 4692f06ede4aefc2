"""Hash-encoding + MLP fwd/bwd microbenchmark at the training batch
geometry — the "hash+MLP fwd/bwd µs/batch" datum BASELINE.json asks for.

Dedupe-proof: the device tunnel memoizes repeated identical dispatches,
so every iteration runs on a distinct pre-staged input. Prints one JSON
line.
"""

from __future__ import annotations

import json
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

K_STAGED = 8


def timeit(fn, staged, warm):
    out = fn(*warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in staged]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(staged) * 1e3  # ms


def main():
    from __graft_entry__ import _default_config
    from ngp_tpu.models.factory import create_nerf_network

    batch = int(os.environ.get("BENCH_ENCODE_BATCH", 163840))
    cfg = _default_config()
    if os.environ.get("BENCH_ENCODE_INTERP"):
        cfg["encoding"]["interpolation"] = os.environ["BENCH_ENCODE_INTERP"]
    net = create_nerf_network(cfg)
    params = net.init(jax.random.PRNGKey(0))
    enc = net.pos_encoding
    ep = params["pos_encoding"]

    key = jax.random.PRNGKey(1)
    staged_x = [
        jax.random.uniform(jax.random.fold_in(key, i), (batch, 3))
        for i in range(K_STAGED + 1)
    ]
    staged_d = [
        jax.random.uniform(jax.random.fold_in(key, 100 + i), (batch, 3))
        for i in range(K_STAGED + 1)
    ]
    jax.block_until_ready((staged_x, staged_d))

    res = {"batch": batch, "backend": jax.default_backend(),
           "interpolation": cfg["encoding"].get("interpolation", "Linear"),
           "levels": cfg["encoding"]["n_levels"]}

    # hash encode forward
    f_fwd = jax.jit(lambda t, x: enc({"table": t}, x))
    res["hash_fwd_ms"] = round(
        timeit(f_fwd, [(ep["table"], x) for x in staged_x[1:]],
               (ep["table"], staged_x[0])), 3)

    # hash encode fwd+bwd (table grads)
    f_fb = jax.jit(
        jax.grad(lambda t, x: jnp.sum(enc({"table": t}, x) ** 2))
    )
    res["hash_fwdbwd_ms"] = round(
        timeit(f_fb, [(ep["table"], x) for x in staged_x[1:]],
               (ep["table"], staged_x[0])), 3)

    # full network forward (encode + both MLPs + SH)
    n_fwd = jax.jit(lambda p, x, d: net(p, x, d))
    res["network_fwd_ms"] = round(
        timeit(n_fwd, [(params, x, d) for x, d in
                       zip(staged_x[1:], staged_d[1:])],
               (params, staged_x[0], staged_d[0])), 3)

    # full network fwd+bwd
    n_fb = jax.jit(
        jax.grad(lambda p, x, d: jnp.sum(net(p, x, d) ** 2))
    )
    res["network_fwdbwd_ms"] = round(
        timeit(n_fb, [(params, x, d) for x, d in
                      zip(staged_x[1:], staged_d[1:])],
               (params, staged_x[0], staged_d[0])), 3)

    # MLP-only (64-wide chains on pre-encoded features)
    feat = [jax.random.normal(jax.random.fold_in(key, 200 + i),
                              (batch, enc.n_output_dims))
            for i in range(K_STAGED + 1)]
    m_fwd = jax.jit(lambda p, f: net.density_mlp(p, f))
    res["density_mlp_fwd_ms"] = round(
        timeit(m_fwd, [(params["density_mlp"], f) for f in feat[1:]],
               (params["density_mlp"], feat[0])), 3)

    for k in list(res):
        if k.endswith("_ms"):
            res[k.replace("_ms", "_us_per_batch")] = round(res[k] * 1e3, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
