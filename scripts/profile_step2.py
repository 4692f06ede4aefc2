"""Dedupe-safe phase profiler for the NeRF train step.

The axon device tunnel dedupes repeated executions with identical
arguments, so every timing loop here threads a DISTINCT input (a fresh
PRNG key or pre-staged array) through each iteration. Times each jitted
phase at the bench's exact batch geometry after a real warmup on fox.
"""

from __future__ import annotations

import argparse
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

FOX = "/root/reference/data/nerf/fox"


def timeit_keys(fn, keys, *args, **kw):
    """fn(key, *args): distinct key per iteration defeats tunnel dedupe."""
    out = fn(keys[-1], *args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(k, *args, **kw) for k in keys[:-1]]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (len(keys) - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 18)
    ap.add_argument("--steps", type=int, default=256, help="pre-train steps")
    ap.add_argument("--iters", type=int, default=9)
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
    print(f"backend={jax.default_backend()} n_lattice={engine.n_lattice} "
          f"k0={engine._k} batch={args.batch}")

    t0 = time.time()
    state, grid, m = engine.train(state, grid, args.steps)
    jax.block_until_ready(state.params)
    print(f"{args.steps} pre-train steps: {time.time()-t0:.1f}s k={engine._k} "
          f"mean_total={float(m['mean_total']):.1f} "
          f"mean_density={float(grid.mean_density):.4f} "
          f"occ_frac={float(jnp.mean((grid.bitfield > 0).astype(jnp.float32))):.3f}")

    k = engine._k
    n_rays = args.batch // k
    data = engine.data
    keys = [jax.random.PRNGKey(1000 + i) for i in range(args.iters)]

    # 1. ray sample + march
    from ngp_tpu.ops.marching import march_rays

    @jax.jit
    def phase_march(key, bitfield):
        b = engine._sample_ray_batch(key, data, n_rays, None)
        mr = march_rays(
            b.origins, b.dirs, bitfield, engine.aabb.min, engine.aabb.max,
            engine.stepping, b.n0, engine.n_lattice, k, engine.grid_cfg.max_mip,
        )
        return mr.t, mr.valid, b.origins, b.dirs

    t_march = timeit_keys(phase_march, keys, grid.bitfield)
    tt, valid, o, d = map(jax.block_until_ready, phase_march(keys[0], grid.bitfield))
    fv = float(jnp.mean(valid.astype(jnp.float32)))
    print(f"1. sample+march ({n_rays} rays x {k}): {t_march:7.1f} ms  valid={fv:.3f}")

    # sub-phase: sampling only
    @jax.jit
    def phase_sample(key):
        b = engine._sample_ray_batch(key, data, n_rays, None)
        return b.origins, b.dirs, b.n0

    t_samp = timeit_keys(phase_sample, keys)
    print(f"   1a. ray sampling only: {t_samp:7.1f} ms")

    # 2. compaction plan
    from ngp_tpu.ops.compaction import compaction_plan, compact_rows

    budget = engine.samples_per_step

    @jax.jit
    def phase_plan(key, bitfield):
        b = engine._sample_ray_batch(key, data, n_rays, None)
        mr = march_rays(
            b.origins, b.dirs, bitfield, engine.aabb.min, engine.aabb.max,
            engine.stepping, b.n0, engine.n_lattice, k, engine.grid_cfg.max_mip,
        )
        return compaction_plan(jnp.transpose(mr.valid).reshape(-1), budget).cidx

    t_plan = timeit_keys(phase_plan, keys, grid.bitfield) - t_march
    print(f"2. compaction plan (marginal): {t_plan:7.1f} ms (budget={budget})")

    # 3. network fwd on compacted budget rows (distinct pos per iter)
    mp = engine.network
    pos_sets = []
    for i in range(args.iters):
        kk = jax.random.PRNGKey(7 + i)
        pos_sets.append(jax.random.uniform(kk, (budget, 3)))
    dirs_w = jax.block_until_ready(jax.random.uniform(jax.random.PRNGKey(3), (budget, 3)))

    @jax.jit
    def phase_fwd(pos, params):
        return mp(params, pos, dirs_w)

    out = phase_fwd(pos_sets[-1], state.params["model"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [phase_fwd(p, state.params["model"]) for p in pos_sets[:-1]]
    jax.block_until_ready(outs)
    t_fwd = (time.perf_counter() - t0) / (args.iters - 1) * 1e3
    print(f"3. network fwd ({budget} rows): {t_fwd:7.1f} ms")

    # 3b. encode fwd only
    enc = engine.network.pos_encoding

    @jax.jit
    def phase_enc(pos, p):
        return enc(p, pos)

    out = phase_enc(pos_sets[-1], state.params["model"]["pos_encoding"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [phase_enc(p, state.params["model"]["pos_encoding"]) for p in pos_sets[:-1]]
    jax.block_until_ready(outs)
    t_enc = (time.perf_counter() - t0) / (args.iters - 1) * 1e3
    print(f"   3b. hash-encode fwd only: {t_enc:7.1f} ms")

    # 4. network fwd+bwd on budget rows
    @jax.jit
    def phase_netg(pos, params):
        return jax.grad(
            lambda p: jnp.sum(mp(p, pos, dirs_w))
        )(params)

    out = phase_netg(pos_sets[-1], state.params["model"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [phase_netg(p, state.params["model"]) for p in pos_sets[:-1]]
    jax.block_until_ready(outs)
    t_netg = (time.perf_counter() - t0) / (args.iters - 1) * 1e3
    print(f"4. network fwd+bwd: {t_netg:7.1f} ms")

    # 5. full loss+grads
    @jax.jit
    def phase_lg(key, params, bitfield, mean_density):
        return engine.batch_loss_and_grads(
            params, bitfield, mean_density, key, data, k, n_rays
        )[2]

    t_lg = timeit_keys(phase_lg, keys, state.params, grid.bitfield, grid.mean_density)
    print(f"5. loss+grads total: {t_lg:7.1f} ms")

    # 6. optimizer apply (distinct grads per iter — scale by i)
    g = jax.block_until_ready(phase_lg(keys[0], state.params, grid.bitfield, grid.mean_density))

    @jax.jit
    def phase_opt(i, state, g):
        g2 = jax.tree.map(lambda x: x * (1.0 + i * 1e-6), g)
        return engine.apply_grads(state, g2)

    out = phase_opt(jnp.float32(0), state, g)
    jax.block_until_ready(out.params)
    t0 = time.perf_counter()
    outs = [phase_opt(jnp.float32(i + 1), state, g) for i in range(args.iters - 1)]
    jax.block_until_ready([o.params for o in outs])
    t_opt = (time.perf_counter() - t0) / (args.iters - 1) * 1e3
    print(f"6. optimizer apply: {t_opt:7.1f} ms")

    # 7. composed train_step
    st = state
    st, _, _ = engine.train_step(st, grid, None, keys[0])
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    for i in range(args.iters - 1):
        st, _, _ = engine.train_step(st, grid, None, keys[i])
    jax.block_until_ready(st.params)
    t_step = (time.perf_counter() - t0) / (args.iters - 1) * 1e3
    print(f"7. composed train_step: {t_step:7.1f} ms -> "
          f"{engine.samples_per_step/t_step*1e3/1e6:.2f} Msamples/s")

    # 8. grid update
    @jax.jit
    def phase_grid(key, params, grid_density, ema_step):
        from ngp_tpu.ops import occupancy as occ
        g2 = grid._replace(density=grid_density, ema_step=ema_step)
        return engine._update_grid(params["model"], g2, key, False)

    try:
        t_grid = timeit_keys(phase_grid, keys, state.params, grid.density, grid.ema_step)
        print(f"8. grid update: {t_grid:7.1f} ms")
    except Exception as e:
        # fall back to public API timing
        t0 = time.perf_counter()
        for i in range(4):
            grid2 = engine.update_grid(state, grid, keys[i], False)
        jax.block_until_ready(grid2.density)
        print(f"8. grid update (public, dedupe-prone): {(time.perf_counter()-t0)/4*1e3:7.1f} ms [{e}]")


if __name__ == "__main__":
    main()
