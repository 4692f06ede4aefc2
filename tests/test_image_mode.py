import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.config import load_config
from ngp_tpu.data.exr import read_exr, write_exr
from ngp_tpu.data.image_loader import load_binary_image, load_image, save_binary_image
from ngp_tpu.engines.image import ImageEngine, eval_image_and_snap
from ngp_tpu.ops.image_sampler import halton23, sample_positions, sobol2
from ngp_tpu.utils.snapshot import load_snapshot, save_snapshot

ALBERT = "/root/reference/data/image/albert.exr"


def test_read_albert():
    img = read_exr(ALBERT)
    assert img.shape == (1024, 1024, 4)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.001


def test_exr_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(33, 65, 3).astype(np.float16).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    img2 = read_exr(p)
    np.testing.assert_array_equal(img2, img)


def test_binary_image_roundtrip(tmp_path):
    img = np.random.RandomState(1).rand(16, 8, 4).astype(np.float32)
    p = str(tmp_path / "t.bin")
    save_binary_image(p, img)
    img2 = load_binary_image(p)
    np.testing.assert_allclose(img2, img, atol=1e-3)


def test_halton_low_discrepancy():
    pts = np.asarray(halton23(jnp.uint32(0), 256))
    assert pts.shape == (256, 2)
    assert (pts >= 0).all() and (pts < 1).all()
    # first halton(2) values: 0, 1/2, 1/4, 3/4 ...
    np.testing.assert_allclose(pts[1, 0], 0.5)
    np.testing.assert_allclose(pts[2, 0], 0.25)
    np.testing.assert_allclose(pts[1, 1], 1 / 3, rtol=1e-5)


def test_sobol_in_unit_square():
    pts = np.asarray(sobol2(jnp.uint32(0), 512, jnp.uint32(7)))
    assert (pts >= 0).all() and (pts < 1).all()
    # scrambles shouldn't collapse: mean near 0.5
    assert abs(pts.mean() - 0.5) < 0.05


def test_stratified_coverage():
    pts = np.asarray(
        sample_positions("Stratified", jax.random.PRNGKey(0), jnp.uint32(0), 1024)
    )
    # every cell of the 32x32 grid gets exactly one sample
    cells = (pts * 32).astype(int)
    ids = cells[:, 0] * 32 + cells[:, 1]
    assert len(np.unique(ids)) == 1024


def test_eval_image_snap():
    img = jnp.arange(4 * 4 * 4, dtype=jnp.float32).reshape(4, 4, 4) / 255.0
    pos = jnp.asarray([[0.1, 0.1], [0.9, 0.6]])
    p, rgb = eval_image_and_snap(img, pos, True, True)
    np.testing.assert_allclose(np.asarray(p[0]), [0.125, 0.125])
    np.testing.assert_allclose(np.asarray(rgb[0]), np.asarray(img[0, 0, :3]))
    np.testing.assert_allclose(np.asarray(rgb[1]), np.asarray(img[2, 3, :3]))


@pytest.mark.slow
def test_image_fit_albert_downscaled():
    """End-to-end: fit a downscaled albert and check PSNR improves well past
    a flat-image baseline. (The reference fits the full image in seconds on
    GPU; this is the CPU smoke version.)"""
    img = read_exr(ALBERT)[::8, ::8]  # 128x128
    cfg = load_config("/root/reference/configs/image/base.json")
    cfg["encoding"]["log2_hashmap_size"] = 16
    engine = ImageEngine(cfg, img, random_mode="Uniform")
    state = engine.init_state()
    mse0 = engine.compute_mse(state)
    state, losses = engine.train(state, 300, batch_size=1 << 14)
    mse = engine.compute_mse(state)
    psnr = -10 * np.log10(mse)
    assert psnr > 20, (mse0, mse, psnr)


def test_snapshot_roundtrip(tmp_path):
    tree = {
        "params": {"w": np.random.RandomState(0).rand(4, 4).astype(np.float32)},
        "step": 123,
        "nested": [np.arange(5), "hello", 1.5],
    }
    for ext in ("msgpack", "ingp"):
        p = str(tmp_path / f"snap.{ext}")
        save_snapshot(p, tree)
        out = load_snapshot(p)
        assert out["step"] == 123
        assert out["version"] == 1
        np.testing.assert_array_equal(out["params"]["w"], tree["params"]["w"])
        np.testing.assert_array_equal(out["nested"][0], tree["nested"][0])
        assert out["nested"][1] == "hello"
