"""DP scaling-efficiency probe on a virtual 8-device CPU mesh.

BASELINE.md's north star asks for >=80% rays/s scaling efficiency across
devices. Real multi-chip hardware isn't available here, so this measures
the *software* overhead of the shard_map DP step on N virtual CPU devices
vs 1: same per-device workload, efficiency = t(1 dev) / t(N dev) for an
N-times-larger global batch (weak scaling). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def time_steps(step, state, grid, key, n=6):
    import jax.random as jr

    state, _ = step(state, grid, jr.fold_in(key, 999))  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n):
        state, _ = step(state, grid, jr.fold_in(key, i))
    jax.block_until_ready(state.params)
    return (time.perf_counter() - t0) / n


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
    t1 = time_steps(build_dp_train_step(e1, make_mesh(1)), s1, g1, key)

    en = NerfEngine(_default_config(), ds, batch_size=per_dev_batch * n_dev)
    sn, gn = en.init_state(), en.init_grid()
    tn = time_steps(build_dp_train_step(en, make_mesh(n_dev)), sn, gn, key)

    eff = t1 / tn
    print(json.dumps({
        "n_devices": n_dev,
        "weak_scaling_efficiency": round(eff, 3),
        "t_step_1dev_ms": round(t1 * 1e3, 1),
        "t_step_ndev_ms": round(tn * 1e3, 1),
        "note": "virtual CPU devices; measures shard_map/collective overhead only",
    }))


if __name__ == "__main__":
    main()
