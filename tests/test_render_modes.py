"""NeRF debug render modes + overlays (ERenderMode parity,
``common.h:110-122``, ``testbed_nerf.cu:1024-1230``, GUI overlays
``testbed.cu:4722-4774``)."""

import jax
import numpy as np
import pytest

from __graft_entry__ import _default_config, _tiny_sphere_dataset
from ngp_tpu.engines.nerf import NerfEngine


@pytest.fixture(scope="module")
def trained():
    eng = NerfEngine(_default_config(), _tiny_sphere_dataset(n_views=6, res=64),
                     batch_size=1 << 12)
    state = eng.init_state()
    grid = eng.init_grid()
    state, grid, _ = eng.train(state, grid, 12)
    return eng, state, grid


@pytest.mark.parametrize("mode", ["shade", "depth", "normals", "positions",
                                   "cost", "ao"])
def test_render_modes(trained, mode):
    eng, state, grid = trained
    img = eng.render_image(state, grid, 0, stride=8, mode=mode)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_overlays(trained):
    eng, state, grid = trained
    gt = eng.render_image(state, grid, 0, stride=8, overlay="gt")
    err = eng.render_image(state, grid, 0, stride=8, overlay="error")
    assert gt.shape == err.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(err)).all()
    with pytest.raises(ValueError):
        eng.render_image(state, grid, 0, stride=8, overlay="nope")


def test_density_slice(trained):
    eng, state, grid = trained
    s = eng.render_density_slice(state, 0.5, resolution=16)
    assert s.shape == (16, 16)
    assert np.isfinite(s).all() and (s >= 0).all()


def test_render_view_dof(trained):
    eng, state, grid = trained
    xf = np.asarray(eng.data.xforms[0])
    f = np.asarray(eng.data.focals[0])
    sharp, _, _ = eng.render_view(state, grid, xf, f, width=16, height=16)
    blurred, _, _ = eng.render_view(
        state, grid, xf, f, width=16, height=16, spp=4,
        snap_to_pixel_centers=False, aperture_size=0.05, focus_z=0.8,
    )
    assert blurred.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(blurred)).all()
    assert not np.allclose(np.asarray(sharp), np.asarray(blurred), atol=1e-4)


def test_render_crop_box(trained):
    """render_aabb crop (m_render_aabb / the crop gizmo): an empty crop
    box renders pure background; restoring None renders the scene."""
    eng, state, grid = trained
    full = np.asarray(eng.render_image(state, grid, 0, stride=4))
    eng.render_aabb = (np.full(3, 0.01, np.float32), np.full(3, 0.02, np.float32))
    try:
        eng._jit_cache.clear()
        cropped = np.asarray(eng.render_image(state, grid, 0, stride=4))
    finally:
        eng.render_aabb = None
        eng._jit_cache.clear()
    bg = np.asarray(eng.background_color, np.float32)
    assert np.allclose(cropped, bg[None, None, :], atol=1e-3)
    assert not np.allclose(full, cropped, atol=1e-2)


def test_render_encoding_vis(trained):
    """EncodingVis: composite the position encoding's features as color
    (network.visualize_activation counterpart)."""
    eng, state, grid = trained
    img = eng.render_image(state, grid, 0, stride=4, mode="encoding")
    arr = np.asarray(img)
    assert arr.shape[-1] == 3 and np.isfinite(arr).all()
    assert (arr >= 0).all() and (arr <= 1).all()


def test_staged_render_matches_single_pass():
    """The staged survivor-compaction renderer (render_staged=True, the
    default for shade/depth/ao) must match the single-pass renderer — its
    only semantic deltas are the conservative segment-local
    min_transmittance cut and the per-stage compaction budgets."""
    import numpy as np

    from tests.test_nerf_engine import CONFIG, _make_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    eng = NerfEngine(
        dict(CONFIG), _make_dataset(4), batch_size=1 << 13, grid_size=32,
        n_steps_per_unit=256, seed=11,
    )
    state, grid = eng.init_state(), eng.init_grid()
    state, grid, _ = eng.train(state, grid, 48)
    for mode in ("shade", "depth", "ao"):
        eng._jit_cache.clear()
        eng.render_staged = True
        a = np.asarray(eng.render_image(state, grid, 0, stride=4, mode=mode))
        eng._jit_cache.clear()
        eng.render_staged = False
        b = np.asarray(eng.render_image(state, grid, 0, stride=4, mode=mode))
        assert np.abs(a - b).max() < 0.02, (mode, np.abs(a - b).max())
    eng.render_staged = True
