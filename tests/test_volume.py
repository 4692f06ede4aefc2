"""Volume mode tests: NanoVDB codec round trip (validated against the real
NanoVDB.h via a g++-compiled checker when available), DenseVolume derived
quantities, Woodcock training-data generation, and an end-to-end fit of a
procedural cloud."""

import os
import shutil
import subprocess
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.data.nanovdb_codec import read_nanovdb_dense, write_nanovdb
from ngp_tpu.data.volume import DenseVolume, load_volume, procedural_cloud


def test_nanovdb_roundtrip():
    rng = np.random.default_rng(0)
    vol = (
        rng.uniform(0, 2, size=(40, 24, 17))
        * (rng.uniform(size=(40, 24, 17)) > 0.4)
    ).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.nvdb")
        write_nanovdb(p, vol)
        back = read_nanovdb_dense(p)
        np.testing.assert_array_equal(back, vol)
        # DenseVolume loads it
        dv = load_volume(p)
        assert dv.global_majorant == pytest.approx(float(vol.max()))


@pytest.mark.skipif(
    shutil.which("g++") is None
    or not os.path.isdir("/root/reference/dependencies/nanovdb"),
    reason="needs g++ + vendored NanoVDB header",
)
def test_nanovdb_against_real_library(tmp_path):
    """The real NanoVDB.h accessors must read our writer's output."""
    tool = tmp_path / "nvdb_check"
    r = subprocess.run(
        [
            "g++", "-O2", "-std=c++14",
            "-I/root/reference/dependencies/nanovdb",
            "-o", str(tool),
            os.path.join(os.path.dirname(__file__), "..", "tools", "nvdb_check.cpp"),
        ],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode()[:500]
    rng = np.random.default_rng(1)
    vol = (rng.uniform(0, 3, size=(20, 33, 9)).astype(np.float32)
           * (rng.uniform(size=(20, 33, 9)) > 0.5))
    p = str(tmp_path / "v.nvdb")
    write_nanovdb(p, vol.astype(np.float32))
    out = subprocess.run([str(tool), p], capture_output=True)
    assert out.returncode == 0, out.stderr.decode()[:500]
    got = np.frombuffer(out.stdout, np.float32).reshape(vol.shape)
    np.testing.assert_array_equal(got, vol.astype(np.float32))


def test_dense_volume_derived():
    vol = np.zeros((64, 32, 16), np.float32)
    vol[10:20, 5:15, 3:9] = 2.5
    dv = DenseVolume.from_dense(vol)
    assert dv.global_majorant == 2.5
    assert dv.world2index_scale == 64.0
    # aabb is centered, largest dim spans [0,1]
    np.testing.assert_allclose(dv.aabb_min, [0.0, 0.25, 0.375], atol=1e-6)
    np.testing.assert_allclose(dv.aabb_max, [1.0, 0.75, 0.625], atol=1e-6)
    assert int(np.asarray(dv.bitgrid).sum()) > 0


CONFIG = {
    "loss": {"otype": "L2"},
    "optimizer": {
        "otype": "Ema",
        "decay": 0.95,
        "nested": {"otype": "Adam", "learning_rate": 1e-3, "beta1": 0.9,
                   "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
    },
    "encoding": {"otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
                 "log2_hashmap_size": 14, "base_resolution": 8,
                 "per_level_scale": 1.6},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "ReLU", "n_neurons": 64,
                "n_hidden_layers": 2},
}


@pytest.fixture(scope="module")
def engine():
    from ngp_tpu.engines.volume import VolumeEngine

    return VolumeEngine(
        dict(CONFIG), procedural_cloud(res=32), batch_size=1 << 12, seed=5
    )


def test_training_data_generation(engine):
    pos, targets, valid = engine.generate_training_data(jax.random.PRNGKey(0), 512)
    pos, targets, valid = map(np.asarray, (pos, targets, valid))
    assert pos.shape == (2048, 3) and targets.shape == (2048, 4)
    assert valid.sum() > 200  # a healthy fraction of slots fill
    v = pos[valid]
    # recorded vertices are inside the volume AABB
    assert np.all(v >= engine.volume.aabb_min - 1e-5)
    assert np.all(v <= engine.volume.aabb_max + 1e-5)
    # densities are plausible
    d = targets[valid][:, 3]
    assert d.max() <= engine.volume.global_majorant + 1e-5
    assert (d > 0).mean() > 0.5


@pytest.mark.slow
def test_volume_fit(engine):
    state = engine.init_state()
    state, loss = engine.train(state, 150)
    assert np.isfinite(float(loss))

    # learned density should correlate with the reference field
    key = jax.random.PRNGKey(3)
    pos = engine.aabb_min + jax.random.uniform(key, (4096, 3)) * (
        engine.aabb_max - engine.aabb_min
    )
    pred = engine.model(engine.trainer.inference_params(state), pos)[:, 3]
    gt = engine._density_at(pos, jax.random.fold_in(key, 1))
    corr = np.corrcoef(np.asarray(pred), np.asarray(gt))[0, 1]
    assert corr > 0.5, corr

    img, opa = engine.render_image(
        state, eye=[0.5, 0.5, 2.2], lookat=[0.5, 0.5, 0.5], resolution=(32, 32)
    )
    img_gt, opa_gt = engine.render_image(
        state, eye=[0.5, 0.5, 2.2], lookat=[0.5, 0.5, 0.5], resolution=(32, 32), gt=True
    )
    # the cloud blocks the center of the frame in both renders
    assert opa[16, 16] > 0.5 and opa_gt[16, 16] > 0.5
    assert opa[0, 0] < 0.1 and opa_gt[0, 0] < 0.1
