"""Profile the NeRF train step's phases on the real accelerator.

Times each jitted phase separately (sample+march, network fwd, full
loss+grad, hash backward in isolation, optimizer) plus the composed
train_step, at the bench's batch geometry. Prints a table; optional
``--trace DIR`` writes a jax.profiler trace (SURVEY.md §5.1).
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


def timeit(fn, *args, n=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 18)
    ap.add_argument("--k", type=int, default=None, help="samples/ray bucket")
    ap.add_argument("--steps", type=int, default=64, help="pre-train steps")
    ap.add_argument("--trace", type=str, default=None)
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
    print(f"{args.steps} pre-train steps: {time.time()-t0:.1f}s  k={engine._k} "
          f"mean_total={float(m['mean_total']):.1f}")

    if args.k:
        engine._k = args.k
    k = engine._k
    n_rays = args.batch // k
    key = jax.random.PRNGKey(7)
    data = engine.data

    # phase: ray sample + march
    def phase_march(key, data, bitfield):
        b = engine._sample_ray_batch(key, data, n_rays, None)
        from ngp_tpu.ops.marching import march_rays

        marched = march_rays(
            b.origins, b.dirs, bitfield, engine.aabb.min, engine.aabb.max,
            engine.stepping, b.n0, engine.n_lattice, k, engine.grid_cfg.max_mip,
        )
        return marched.t, marched.valid, b.origins, b.dirs, b.target_rgba

    jit_march = jax.jit(phase_march)
    t_march = timeit(jit_march, key, data, grid.bitfield)
    tt, valid, o, d, tgt = jit_march(key, data, grid.bitfield)
    frac_valid = float(jnp.mean(valid.astype(jnp.float32)))
    print(f"march+sample ({n_rays} rays x {k}): {t_march:.1f} ms   valid={frac_valid:.2f}")

    # phase: network forward on all slots
    marched_pos = (o[:, None, :] + d[:, None, :] * tt[..., None]).reshape(-1, 3)
    pos_w = engine.aabb.relative_pos(marched_pos)
    dir_w = jnp.broadcast_to(d[:, None, :], (n_rays, k, 3)).reshape(-1, 3) * 0.5 + 0.5

    def phase_fwd(params, pos_w, dir_w):
        return engine.network(params, pos_w, dir_w)

    jit_fwd = jax.jit(phase_fwd)
    t_fwd = timeit(jit_fwd, state.params["model"], pos_w, dir_w)
    print(f"network fwd ({pos_w.shape[0]} samples): {t_fwd:.1f} ms")

    # phase: encoding forward only
    enc = engine.network.pos_encoding

    def phase_enc(p, x):
        return enc(p, x)

    jit_enc = jax.jit(phase_enc)
    t_enc = timeit(jit_enc, state.params["model"]["pos_encoding"], pos_w)
    print(f"hash encode fwd: {t_enc:.1f} ms")

    # phase: encoding fwd+bwd
    def phase_enc_grad(p, x):
        return jax.grad(lambda p: jnp.sum(enc(p, x)))(p)

    jit_encg = jax.jit(phase_enc_grad)
    t_encg = timeit(jit_encg, state.params["model"]["pos_encoding"], pos_w)
    print(f"hash encode fwd+bwd: {t_encg:.1f} ms")

    # phase: network fwd+bwd
    def phase_net_grad(p, x, dw):
        return jax.grad(lambda p: jnp.sum(engine.network(p, x, dw)))(p)

    jit_netg = jax.jit(phase_net_grad)
    t_netg = timeit(jit_netg, state.params["model"], pos_w, dir_w)
    print(f"network fwd+bwd: {t_netg:.1f} ms")

    # phase: full loss+grads (march + fwd + composite + bwd)
    def phase_lg(params, key, bitfield, mean_density, data):
        return engine.batch_loss_and_grads(
            params, bitfield, mean_density, key, data, k, n_rays
        )[2]

    jit_lg = jax.jit(phase_lg)
    t_lg = timeit(jit_lg, state.params, key, grid.bitfield, grid.mean_density, data)
    print(f"loss+grads total: {t_lg:.1f} ms")

    # phase: optimizer
    g = jit_lg(state.params, key, grid.bitfield, grid.mean_density, data)

    def phase_opt(state, g):
        return engine.apply_grads(state, g)

    jit_opt = jax.jit(phase_opt)
    t_opt = timeit(jit_opt, state, g)
    print(f"optimizer apply: {t_opt:.1f} ms")

    # composed step — train_step donates the state, so rebind it each call
    # instead of reusing a freed buffer
    st = state
    st, _, _ = engine.train_step(st, grid, None, key)  # compile
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    n_comp = 10
    for i in range(n_comp):
        st, _, _ = engine.train_step(st, grid, None, jax.random.fold_in(key, i))
    jax.block_until_ready(st.params)
    t_step = (time.perf_counter() - t0) / n_comp * 1e3
    print(f"composed train_step: {t_step:.1f} ms  -> "
          f"{engine.samples_per_step / t_step * 1e3 / 1e6:.2f} Msamples/s "
          f"(network rows; {args.batch / t_step * 1e3 / 1e6:.2f} M slots/s)")
    state = st

    # grid update
    t_grid = timeit(lambda: engine.update_grid(state, grid, key, False), n=5)
    print(f"grid update (non-warmup): {t_grid:.1f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(3):
                st2, _, _ = engine.train_step(state, grid, None, jax.random.fold_in(key, i))
            jax.block_until_ready(st2.params)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
