"""Observability meters (SURVEY §5.1/§5.5): EMA timers, throughput meters,
JSONL metrics logging, loss-EMA snapshot round trip."""

import json
import os

import numpy as np

from ngp_tpu.utils.meters import Ema, MetricsLogger, TrainMeters


def test_ema_half_life():
    e = Ema(half_life_s=1.0)
    e.update(0.0, now=0.0)
    v = e.update(1.0, now=1.0)  # one half-life later: halfway
    assert abs(v - 0.5) < 1e-9


def test_train_meters_loss_and_psnr():
    m = TrainMeters(loss_half_life_steps=1.0)
    m.update_loss(0.1)
    assert m.loss_ema == 0.1
    m.update_loss(0.0)
    assert abs(m.loss_ema - 0.05) < 1e-9
    assert m.psnr == -10.0 * np.log10(0.05)
    m.update_window(10, samples=1e6, rays=1e3, elapsed_s=1.0)
    assert m.samples_per_s.value == 1e6
    assert m.step_ms.value == 100.0
    assert len(m.loss_graph) == 2


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(p)
    lg.log(5, loss=0.25, samples_per_s=1e6)
    lg.log(10, loss=0.125)
    lg.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["step"] == 5 and recs[0]["loss"] == 0.25
    assert recs[1]["step"] == 10


def test_train_loop_meters_and_snapshot_loss_ema(tmp_path):
    from __graft_entry__ import _default_config, _tiny_sphere_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    eng = NerfEngine(_default_config(), _tiny_sphere_dataset(n_views=4, res=32),
                     batch_size=1 << 11, adapt_every=4)
    state, grid = eng.init_state(), eng.init_grid()
    mf = str(tmp_path / "metrics.jsonl")
    state, grid, _ = eng.train(state, grid, 8, metrics_file=mf)
    assert eng.meters.n_loss_updates >= 2
    assert eng.meters.samples_per_s.value > 0
    assert os.path.exists(mf) and len(open(mf).read().splitlines()) >= 2

    snap = str(tmp_path / "s.msgpack")
    eng.save_snapshot(snap, state, grid)
    ema_before = eng.meters.loss_ema
    eng.meters = None
    eng.load_snapshot(snap)
    assert abs(eng.meters.loss_ema - ema_before) < 1e-12
