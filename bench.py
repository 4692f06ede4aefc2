"""Benchmark: fox NeRF training throughput + quality on the available
accelerator.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}``

Baseline estimate: the reference trains "a fox NeRF in under 5 seconds" on
an RTX 3090 (``/root/reference/README.md:5``) at batch 2^18 samples/step —
roughly 1000 steps in ~5 s ≈ **5.2e7 training samples/s**. ``vs_baseline``
is measured samples/s against that estimate.

The whole run is wall-clock budgeted (``BENCH_BUDGET_S``, default 1500 s —
first compiles on a cold cache eat minutes; a persistent compile cache makes
later invocations cheap). Every phase checks the deadline and degrades
gracefully; the JSON line is printed even on error/timeout, with whatever
was measured so far.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

FOX = "/root/reference/data/nerf/fox"
BASELINE_SAMPLES_PER_S = 5.2e7
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1500))
T_START = time.time()
PARTIAL = os.environ.get(
    "BENCH_PARTIAL_FILE", f"/tmp/ngp_bench_partial_{os.getpid()}.json"
)

RESULT = {
    "metric": "nerf_train_samples_per_s",
    "value": 0.0,
    "unit": "samples/s",
    "vs_baseline": 0.0,
    "extra": {"phase": "init"},
}


def checkpoint_result():
    """Persist the current RESULT so the supervisor can emit it even if
    this process dies inside a native call (where Python signal handlers
    never run — the exact way round 1's bench produced no datum)."""
    RESULT["extra"]["total_wall_s"] = round(time.time() - T_START, 1)
    try:
        with open(PARTIAL, "w") as f:
            json.dump(RESULT, f)
    except OSError:
        pass


def emit_and_exit(signum=None, frame=None):
    RESULT["extra"]["total_wall_s"] = round(time.time() - T_START, 1)
    checkpoint_result()
    print(json.dumps(RESULT), flush=True)
    sys.exit(0)


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def supervise() -> None:
    """Run the measurement in a child process; guarantee ONE JSON line on
    stdout no matter where the child blocks or how it dies — including
    the round-1 failure mode where an OUTER driver `timeout` SIGTERMs this
    supervisor itself before the internal budget elapses."""
    partial = f"/tmp/ngp_bench_partial_{os.getpid()}.json"
    env = {**os.environ, "BENCH_CHILD": "1", "BENCH_PARTIAL_FILE": partial}

    def emit_partial(note: str) -> None:
        try:
            with open(partial) as f:
                snap = json.load(f)
            snap["extra"]["supervisor_note"] = note
            print(json.dumps(snap), flush=True)
            return
        except (OSError, ValueError):
            pass
        RESULT["extra"]["error"] = note
        RESULT["extra"]["total_wall_s"] = round(time.time() - T_START, 1)
        print(json.dumps(RESULT), flush=True)

    child_holder = {}

    def on_signal(signum, frame):
        proc = child_holder.get("proc")
        if proc is not None:
            try:
                proc.kill()
            except OSError:
                pass
        emit_partial(f"supervisor got signal {signum}")
        os._exit(0)  # bypass atexit/buffers: the outer timeout is imminent

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        child_holder["proc"] = proc
        out, err = proc.communicate(timeout=max(BUDGET_S - 5, 30))
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if lines:
            print(lines[-1], flush=True)
            return
        RESULT["extra"]["error"] = (
            f"child rc={proc.returncode}, no JSON; stderr tail: " + err[-300:]
        )
    except subprocess.TimeoutExpired:
        child_holder["proc"].kill()
        RESULT["extra"]["error"] = "supervisor timeout"
    # fall back to the child's last phase checkpoint
    emit_partial(RESULT["extra"].get("error", "recovered from partial"))


def main():
    # A hard alarm slightly inside the budget guarantees the JSON line is
    # printed even if a compile or a device call hangs; SIGTERM/SIGINT
    # handlers do the same if an outer driver timeout fires first
    # (round 1 died to `timeout` with nothing printed — BENCH_r01).
    signal.signal(signal.SIGALRM, emit_and_exit)
    signal.signal(signal.SIGTERM, emit_and_exit)
    signal.signal(signal.SIGINT, emit_and_exit)
    signal.alarm(max(int(BUDGET_S) - 5, 30))

    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from ngp_tpu.engines.nerf import NerfEngine

    if os.path.isdir(FOX):
        from ngp_tpu.data.nerf_loader import load_nerf

        dataset = load_nerf(os.path.join(FOX, "transforms.json"))
        scene = "fox"
    else:
        from __graft_entry__ import _tiny_sphere_dataset

        dataset = _tiny_sphere_dataset(n_views=12, res=128)
        scene = "synthetic-sphere"

    from __graft_entry__ import _default_config

    cfg = _default_config()
    # NGP_TPU_BENCH_INTERP=Simplex: tetrahedral grid lookups (4 rows per
    # sample instead of 8 — see docs/PERF.md; quality-neutral on the
    # sphere and mini-fox checks).
    if os.environ.get("NGP_TPU_BENCH_INTERP"):
        cfg["encoding"]["interpolation"] = os.environ["NGP_TPU_BENCH_INTERP"]
    engine = NerfEngine(cfg, dataset, batch_size=1 << 18)
    state = engine.init_state()
    grid = engine.init_grid()
    RESULT["extra"] = {
        "scene": scene,
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
        "interpolation": cfg["encoding"].get("interpolation", "Linear"),
        "phase": "warmup",
    }
    checkpoint_result()

    # Warmup: compile + let the occupancy grid prune. Chunked so the
    # deadline is honored between chunks. Keep at least 35% of the budget
    # for the measurement itself.
    warm_steps = 0
    warm_target = 448
    t_measure_reserve = 0.35 * BUDGET_S
    while warm_steps < warm_target and remaining() > t_measure_reserve:
        n = min(32, warm_target - warm_steps)
        state, grid, _ = engine.train(state, grid, n)
        warm_steps += n
        RESULT["extra"]["warm_steps"] = warm_steps
        checkpoint_result()
    jax.block_until_ready(state.params)
    RESULT["extra"]["warm_steps"] = warm_steps

    # Measured window: fixed seconds, chunked steps. BENCH_PROFILE=dir
    # wraps it in a jax.profiler trace (SURVEY §5.1).
    RESULT["extra"]["phase"] = "measure"
    window_s = min(60.0, max(remaining() - 60.0, 10.0))
    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
    t0 = time.time()
    measured = 0
    while time.time() - t0 < window_s and remaining() > 30:
        state, grid, _ = engine.train(state, grid, 16)
        measured += 16
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    if prof_dir:
        jax.profiler.stop_trace()
        RESULT["extra"]["profile_dir"] = prof_dir
    if measured == 0:  # budget exhausted before any measured step
        emit_and_exit()

    # Count what the network actually processes per step (= the quantity
    # the reference's 2^18 batch counts: compacted samples).
    samples_per_s = measured * engine.samples_per_step / dt
    RESULT["value"] = round(samples_per_s, 1)
    RESULT["vs_baseline"] = round(samples_per_s / BASELINE_SAMPLES_PER_S, 4)
    RESULT["extra"].update(
        steps_per_s=round(measured / dt, 2),
        measured_steps=measured,
        measure_wall_s=round(dt, 2),
        rays_per_s=round(measured * (engine.batch_size // engine._k) / dt, 1),
        final_k=engine._k,
        step_at_measure_end=int(state.step),
        phase="eval",
    )
    checkpoint_result()

    # Optional quality datum if budget allows.
    if remaining() > 60:
        try:
            psnr = engine.psnr(state, grid, image_index=0, stride=4)
            RESULT["extra"][f"train_view_psnr_step{int(state.step)}"] = round(psnr, 2)
        except Exception as e:  # noqa: BLE001
            RESULT["extra"]["psnr_error"] = repr(e)

    # Optional DP scaling-efficiency datum on a virtual CPU mesh
    # (BASELINE.md: >=80% rays/s scaling efficiency). Run in a subprocess so
    # the CPU platform/device-count env doesn't disturb this process.
    if remaining() > 120 and os.environ.get("BENCH_SCALING", "1") == "1":
        try:
            import subprocess

            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__) or ".",
                                              "scripts", "bench_scaling.py")],
                capture_output=True, text=True, timeout=max(remaining() - 30, 60),
            )
            line = (r.stdout.strip().splitlines() or [""])[-1]
            RESULT["extra"]["dp_scaling"] = json.loads(line) if line.startswith("{") else line[:200]
        except Exception as e:  # noqa: BLE001
            RESULT["extra"]["dp_scaling"] = f"error: {e!r}"

    RESULT["extra"]["phase"] = "done"
    emit_and_exit()


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") != "1":
        supervise()
        sys.exit(0)
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001
        RESULT["extra"]["error"] = repr(e)[:500]
        emit_and_exit()
