"""DP scaling-efficiency probe — the software-side datum for BASELINE.md's
">=80% rays/s scaling efficiency" target (the hardware side needs chips we
don't have; the multichip dryrun validates the sharded program
compiles+runs, this measures its overhead).

Methodology (round-5 revision): **process-level weak scaling with core
pinning**. Round 2-4 used N virtual devices inside one process, where all
devices share one XLA host thread pool — the 1-device baseline silently
used every core, so the N-device step measured host-compute contention,
not scaling (the round-5 backward speedup dropped the apparent efficiency
0.80 → 0.69 with *unchanged* parallel code, giving it away). Here:

1. Baseline: ONE process pinned to 2 cores, 1 CPU device, per-device ray
   batch B.
2. Scaled: TWO processes, each pinned to its own 2 cores, joined via
   ``jax.distributed`` (``ngp_tpu/parallel/multihost.py``), global batch
   2B sharded by the same ``build_dp_train_step`` used on real meshes.
   Gradients ride real cross-process collectives.
3. Weak-scaling efficiency = t_step(1 proc) / t_step(2 proc); every
   device sees identical core budget and per-device work.
4. Collective-cost ablation: the 2-process step re-timed with gradient
   psum/pmax dropped (``sync_gradients=False``) — ``collective_share`` is
   the fraction of step time spent in collectives, the term that shrinks
   on real ICI.

Timing: best-of-3 windows of 12 steps (noise floor; spreads reported).
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PER_DEV_BATCH = 1 << 14
N_STEPS = 12
REPEATS = 3

_WORKER = r"""
import json, os, sys, time

pid = int(os.environ["BS_PID"])
world = int(os.environ["BS_WORLD"])
cores = {0: {0, 1}, 1: {2, 3}}[pid]
try:
    os.sched_setaffinity(0, cores)
except (AttributeError, OSError):
    pass
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
sys.path.insert(0, os.environ["BS_REPO"])

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

if world > 1:
    from ngp_tpu.parallel import multihost
    multihost.initialize()
    assert jax.process_count() == world
    from ngp_tpu.parallel.multihost import make_global_mesh
    mesh = make_global_mesh()
else:
    from ngp_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(1)

from __graft_entry__ import _default_config, _tiny_sphere_dataset
from ngp_tpu.engines.nerf import NerfEngine
from ngp_tpu.parallel.nerf_dp import build_dp_train_step

per_dev = int(os.environ["BS_BATCH"])
n_steps = int(os.environ["BS_STEPS"])
repeats = int(os.environ["BS_REPEATS"])
sync = os.environ.get("BS_SYNC", "1") == "1"

eng = NerfEngine(
    _default_config(), _tiny_sphere_dataset(n_views=6, res=64),
    batch_size=per_dev * world, min_rays_per_batch=world,
)
state, grid = eng.init_state(), eng.init_grid()
step = build_dp_train_step(eng, mesh, sync_gradients=sync)
key = jax.random.PRNGKey(0)
for w in range(2):
    state, _ = step(state, grid, jax.random.fold_in(key, 999 - w))
jax.block_until_ready(state.params)
times = []
for rep in range(repeats):
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, _ = step(state, grid, jax.random.fold_in(key, rep * n_steps + i))
    jax.block_until_ready(state.params)
    times.append((time.perf_counter() - t0) / n_steps)
if world == 1 or jax.process_index() == 0:
    print(json.dumps({"t": min(times),
                      "spread": (max(times) - min(times)) / min(times)}))
"""


def _free_port() -> str:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()
    return addr


def run_world(world: int, sync: bool = True, independent: bool = False
              ) -> tuple[float, float]:
    """``independent=True`` launches ``world`` UNCOUPLED single-device
    processes concurrently (same core pinning, no coordinator) — the
    contention-controlled baseline: it experiences the same shared-L3 /
    memory-bandwidth pressure as the coupled run without any
    coordination, so (t_independent / t_coupled) isolates the
    distribution cost from the host artifact. Returns the slowest
    worker's time."""
    env_base = {
        **os.environ,
        "BS_REPO": REPO,
        "BS_WORLD": "1" if independent else str(world),
        "BS_BATCH": str(PER_DEV_BATCH),
        "BS_STEPS": str(N_STEPS),
        "BS_REPEATS": str(REPEATS),
        "BS_SYNC": "1" if sync else "0",
    }
    if world > 1 and not independent:
        env_base["NGP_COORDINATOR"] = _free_port()
        env_base["NGP_NUM_PROCESSES"] = str(world)
    procs = []
    for pid in range(world):
        env = {**env_base, "BS_PID": str(pid)}
        if world > 1 and not independent:
            env["NGP_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker rc={p.returncode}: {err[-2000:]}")
    results = []
    for out, _ in (outs if independent else outs[:1]):
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    worst = max(results, key=lambda r: r["t"])
    return worst["t"], worst["spread"]


def main():
    nproc = multiprocessing.cpu_count()
    if nproc < 4:
        print(json.dumps({"error": f"need >=4 cores, have {nproc}"}))
        return
    t1, v1 = run_world(1)
    t1c, v1c = run_world(2, independent=True)  # contention-controlled
    t2, v2 = run_world(2)
    t2n, v2n = run_world(2, sync=False)
    eff = t1 / t2
    eff_c = t1c / t2
    coll = max(0.0, (t2 - t2n) / t2)
    print(json.dumps({
        "n_devices": 2,
        "host_cores": nproc,
        "weak_scaling_efficiency": round(eff_c, 3),
        "weak_scaling_efficiency_raw": round(eff, 3),
        "collective_share_of_step": round(coll, 3),
        "t_step_1dev_ms": round(t1 * 1e3, 1),
        "t_step_1dev_contended_ms": round(t1c * 1e3, 1),
        "t_step_ndev_ms": round(t2 * 1e3, 1),
        "t_step_ndev_nosync_ms": round(t2n * 1e3, 1),
        "window_spread": [round(v1, 3), round(v1c, 3), round(v2, 3),
                          round(v2n, 3)],
        "note": (
            "process-level weak scaling: 1 CPU device per process, each "
            "process pinned to 2 cores (identical core budget per device), "
            "jax.distributed collectives between processes. Headline "
            "efficiency uses the contention-controlled baseline (2 "
            "INDEPENDENT pinned processes running concurrently — same "
            "shared-L3/DRAM pressure, zero coordination), so it isolates "
            "the distribution software cost; _raw divides by a solo "
            "1-process run that enjoys the whole L3. collective-drop "
            "ablation isolates the psum/pmax share"
        ),
    }))


if __name__ == "__main__":
    main()
