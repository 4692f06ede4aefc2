"""Held-out evaluation: metrics (SSIM/PSNR/FLIP), render_view, and
eval_test_transforms (the reference's --test_transforms protocol,
``/root/reference/scripts/run.py:208-266``)."""

import numpy as np
import pytest

from ngp_tpu.utils import metrics as M


def test_psnr_ssim_identity():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3)).astype(np.float32)
    assert M.psnr(img, img) >= 120.0 - 1e-6
    assert abs(M.ssim(img, img) - 1.0) < 1e-9


def test_psnr_known_value():
    a = np.zeros((32, 32, 3), np.float32)
    b = np.full((32, 32, 3), 0.1, np.float32)
    assert abs(M.psnr(a, b) - 20.0) < 1e-4


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(1)
    img = np.tile(np.linspace(0, 1, 64, dtype=np.float32)[None, :, None], (64, 1, 3))
    noisy = np.clip(img + 0.2 * rng.standard_normal(img.shape).astype(np.float32), 0, 1)
    s = M.ssim(img, noisy)
    assert 0.0 < s < 0.9
    assert M.ssim(img, img) > s


def test_flip_sanity():
    rng = np.random.default_rng(2)
    img = rng.random((48, 48, 3)).astype(np.float32)
    assert M.flip(img, img) < 1e-6
    other = np.clip(1.0 - img, 0, 1)
    d = M.flip(img, other)
    assert 0.05 < d <= 1.0


@pytest.fixture(scope="module")
def trained_engine():
    from test_nerf_engine import CONFIG, _make_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    engine = NerfEngine(
        dict(CONFIG),
        _make_dataset(),
        batch_size=1 << 13,
        n_render_samples=64,
        grid_size=16,
        n_steps_per_unit=128,
        density_grid_decay=0.8,
        seed=7,
    )
    state = engine.init_state()
    grid = engine.init_grid()
    state, grid, _ = engine.train(state, grid, 60)
    return engine, state, grid


def test_render_view_shape_and_spp(trained_engine):
    engine, state, grid = trained_engine
    xf = engine.dataset.xforms[0, 0]
    W, H = 24, 16
    f = engine.dataset.focal_lengths[0] * W / engine.resolution[0]
    rgb, depth, opa = engine.render_view(state, grid, xf, f, width=W, height=H)
    assert rgb.shape == (H, W, 3) and depth.shape == (H, W) and opa.shape == (H, W)
    assert np.isfinite(np.asarray(rgb)).all()
    # spp=4 with jitter stays close to spp=1 at pixel centers
    rgb4, _, _ = engine.render_view(
        state, grid, xf, f, width=W, height=H, spp=4,
        snap_to_pixel_centers=False,
    )
    assert np.mean(np.abs(np.asarray(rgb4) - np.asarray(rgb))) < 0.2


def test_eval_test_transforms_self(trained_engine):
    """Evaluating the training dataset as the 'test set' must produce
    sane aggregate metrics (a converged fit scores well above noise)."""
    engine, state, grid = trained_engine
    res = engine.eval_test_transforms(
        state, grid, engine.dataset, stride=2, max_views=2
    )
    assert res["n_views"] == 2
    assert res["min_psnr"] <= res["psnr"] <= res["max_psnr"]
    assert 0.0 < res["ssim"] <= 1.0
    assert res["psnr"] > 10.0


def test_dataset_subset_holdout():
    """NerfDataset.subset powers run.py --holdout_every (train/test split
    without a separate transforms file)."""
    from __graft_entry__ import _tiny_sphere_dataset

    ds = _tiny_sphere_dataset(n_views=8, res=16)
    test_idx = [0, 4]
    train_idx = [i for i in range(8) if i not in test_idx]
    tr = ds.subset(train_idx)
    te = ds.subset(test_idx)
    assert tr.n_images == 6 and te.n_images == 2
    np.testing.assert_array_equal(te.images[1], ds.images[4])
    np.testing.assert_array_equal(tr.xforms[0], ds.xforms[1])
    assert tr.resolution == ds.resolution and tr.aabb_scale == ds.aabb_scale


def test_pixel_stride_registration(trained_engine):
    """render_view(pixel_stride=N) casts the SAME rays as the full render
    decimated [::N] — the registration the strided eval protocol needs
    (regression: width/focal shrinking shifted rays by (N-1)/2 px)."""
    engine, state, grid = trained_engine
    xf = engine.dataset.xforms[0, 0]
    f = engine.dataset.focal_lengths[0]
    W, H = engine.resolution
    full, _, _ = engine.render_view(state, grid, xf, f, width=W, height=H)
    strided, _, _ = engine.render_view(
        state, grid, xf, f, width=W, height=H, pixel_stride=2
    )
    assert strided.shape[0] == (H + 1) // 2
    np.testing.assert_allclose(
        np.asarray(strided), np.asarray(full)[::2, ::2], atol=2e-2
    )
