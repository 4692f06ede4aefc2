"""DP scaling-efficiency probe on a virtual CPU mesh — the software-side
datum for BASELINE.md's ">=80% rays/s scaling efficiency" target (the
hardware side needs chips we don't have; the multichip dryrun validates
the sharded program compiles+runs, this measures its overhead).

Methodology (round-2/3 verdict: the old 8-virtual-devices-on-few-cores
number was compute-contention, not scaling):

1. The mesh size is capped at nproc//2 so every virtual device has at
   least two host cores — virtual CPU devices share one process, so
   oversubscription would masquerade as poor scaling.
2. Weak scaling: per-device ray batch held constant, efficiency =
   t(1 dev) / t(N dev).
3. A collective-cost ablation on the SAME global shape: the N-device step
   re-timed with gradient pmean/psum/pmax dropped (shard-local training).
   ``collective_share`` = (t_psum - t_nopsum) / t_psum is the fraction of
   step time spent in collectives — on real ICI this is the term that
   shrinks, so it bounds the hardware-scaling loss from the software side.

Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

NPROC = multiprocessing.cpu_count()
N_DEV = max(2, min(8, NPROC // 2))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def time_steps(step, state, grid, key, n=16, repeats=3):
    """Best-of-``repeats`` windows of ``n`` steps each (round-4 verdict:
    with one 6-step window the noise exceeded the collective cost being
    measured — the no-sync ablation measured *slower* than the synced
    step). Min-of-windows is the standard noise-robust estimator for
    fixed-work timing. Also returns the window spread for the record."""
    import jax.numpy as jnp
    import jax.random as jr

    state = jax.tree.map(jnp.copy, state)  # the step donates its state arg
    for w in range(2):  # compile + warm
        state, _ = step(state, grid, jr.fold_in(key, 999 - w))
    jax.block_until_ready(state.params)
    times = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        for i in range(n):
            state, _ = step(state, grid, jr.fold_in(key, rep * n + i))
        jax.block_until_ready(state.params)
        times.append((time.perf_counter() - t0) / n)
    return min(times), (max(times) - min(times)) / min(times)


def main():
    from __graft_entry__ import _default_config, _tiny_sphere_dataset
    from ngp_tpu.engines.nerf import NerfEngine
    from ngp_tpu.parallel.mesh import make_mesh
    from ngp_tpu.parallel.nerf_dp import build_dp_train_step

    n_dev = jax.device_count()
    key = jax.random.PRNGKey(0)
    ds = _tiny_sphere_dataset(n_views=6, res=64)

    # Per-device workload held constant (weak scaling): batch scales with
    # the mesh size.
    per_dev_batch = 1 << 12
    e1 = NerfEngine(_default_config(), ds, batch_size=per_dev_batch)
    s1, g1 = e1.init_state(), e1.init_grid()
    t1, v1 = time_steps(build_dp_train_step(e1, make_mesh(1)), s1, g1, key)

    en = NerfEngine(_default_config(), ds, batch_size=per_dev_batch * n_dev)
    sn, gn = en.init_state(), en.init_grid()
    mesh_n = make_mesh(n_dev)
    tn, vn = time_steps(build_dp_train_step(en, mesh_n), sn, gn, key)

    # Collective ablation: same global shape, gradients NOT synced
    # (shard-local training — numerically different, identical FLOPs/
    # memory traffic minus the collectives).
    tn_nosync, vns = time_steps(
        build_dp_train_step(en, mesh_n, sync_gradients=False), sn, gn, key
    )

    eff = t1 / tn
    coll = max(0.0, (tn - tn_nosync) / tn)
    print(json.dumps({
        "n_devices": n_dev,
        "host_cores": NPROC,
        "weak_scaling_efficiency": round(eff, 3),
        "collective_share_of_step": round(coll, 3),
        "t_step_1dev_ms": round(t1 * 1e3, 1),
        "t_step_ndev_ms": round(tn * 1e3, 1),
        "t_step_ndev_nosync_ms": round(tn_nosync * 1e3, 1),
        "window_spread": [round(v1, 3), round(vn, 3), round(vns, 3)],
        "note": (
            f"virtual CPU mesh, {N_DEV} devices on {NPROC} cores "
            "(>=2 cores/device); weak scaling + collective-drop ablation; "
            "measures shard_map/collective software overhead only"
        ),
    }))


if __name__ == "__main__":
    main()
