"""Device-op-level profiler for the NeRF train step.

Runs warm train steps under ``jax.profiler.trace`` and aggregates the
device-side "XLA Ops" timeline by op category — the ground-truth
counterpart of the ablation profiler (``profile_ablate.py``), immune to
monkeypatch blind spots. Prints a sorted per-op table and a category
rollup (sort / gather / matmul / elementwise / ...).

Usage: python scripts/profile_trace.py [--steps 3] [--batch 262144]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
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

FOX = "/root/reference/data/nerf/fox"


def categorize(name: str) -> str:
    n = name.lower()
    if "sort" in n:
        return "sort"
    if "gather" in n or "dynamic-slice" in n:
        return "gather"
    if "scatter" in n or "dynamic-update" in n:
        return "scatter"
    if "convolution" in n or "dot" in n or "einsum" in n:
        return "matmul"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "copy/transpose"
    if "reduce" in n or "cumsum" in n:
        return "reduce"
    if "rng" in n:
        return "rng"
    if "fusion" in n or "select" in n or "add" in n or "multiply" in n:
        return "fusion/elementwise"
    return "other"


def parse_trace(tracedir: str):
    files = sorted(glob.glob(os.path.join(tracedir, "plugins/profile/*/*.trace.json.gz")))
    assert files, f"no trace in {tracedir}"
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    # map (pid, tid) -> names
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = []
    modules = []
    for e in ev:
        if e.get("ph") != "X":
            continue
        tn = tnames.get((e["pid"], e["tid"]), "")
        if "TPU" not in pnames.get(e["pid"], ""):
            continue
        if tn == "XLA Ops":
            ops.append(e)
        elif tn == "XLA Modules":
            modules.append(e)
    return ops, modules


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 18)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--pretrain", type=int, default=256)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--n_rays", type=int, default=0, help="override n_rays")
    args = ap.parse_args()

    from __graft_entry__ import _default_config, _tiny_sphere_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    if os.path.isdir(FOX):
        from ngp_tpu.data.nerf_loader import load_nerf

        dataset = load_nerf(os.path.join(FOX, "transforms.json"))
    else:
        dataset = _tiny_sphere_dataset(n_views=12, res=128)

    engine = NerfEngine(_default_config(), dataset, batch_size=args.batch)
    state = engine.init_state()
    grid = engine.init_grid()

    import pickle

    cache = f"/tmp/ngp_profile_state_{args.batch}_{args.pretrain}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            blob = pickle.load(f)
        state = jax.tree.map(jnp.asarray, blob["state"])
        grid = jax.tree.map(jnp.asarray, blob["grid"])
        engine._k = blob["k"]
    else:
        state, grid, m = engine.train(state, grid, args.pretrain)
        with open(cache, "wb") as f:
            pickle.dump(
                {"state": jax.tree.map(np.asarray, state),
                 "grid": jax.tree.map(np.asarray, grid), "k": engine._k}, f)
    engine.adapt_every = 10**9
    if args.n_rays:
        engine._n_rays = args.n_rays
    print(f"backend={jax.default_backend()} k={engine._k} "
          f"n_rays={engine._n_rays} n_lattice={engine.n_lattice}", flush=True)

    key = jax.random.PRNGKey(3)
    # warm up compile
    state, _, m = engine.train_step(state, grid, None, jax.random.fold_in(key, 99))
    float(m["loss"])

    tracedir = "/tmp/ngp_step_trace"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        for i in range(args.steps):
            state, _, m = engine.train_step(state, grid, None, jax.random.fold_in(key, i))
        float(m["loss"])

    ops, modules = parse_trace(tracedir)
    for e in modules:
        print(f"module: {e['name'][:60]:60s} {e['dur']/1e3:8.2f} ms")
    per_op = collections.Counter()
    per_cat = collections.Counter()
    for e in ops:
        name = re.sub(r"\.\d+", "", e["name"])
        per_op[name] += e["dur"]
        per_cat[categorize(name)] += e["dur"]
    total = sum(per_op.values())
    print(f"\ntotal device op time: {total/1e3:.2f} ms over {args.steps} steps "
          f"=> {total/1e3/args.steps:.2f} ms/step")
    print("\n--- categories ---")
    for c, us in per_cat.most_common():
        print(f"{c:>20}: {us/1e3/args.steps:8.2f} ms/step  ({100*us/total:5.1f}%)")
    print(f"\n--- top {args.top} ops (summed over {args.steps} steps) ---")
    for n, us in per_op.most_common(args.top):
        print(f"{us/1e3/args.steps:9.3f} ms/step  {n[:110]}")


if __name__ == "__main__":
    main()
