"""pyngp API-surface parity on the Testbed: dynamic dataset building
(set_camera_extrinsics/intrinsics/set_image), override_sdf_training_data,
and render with start/end camera + shutter (``python_api.cu:266-696``)."""

import numpy as np
import pytest

from ngp_tpu.testbed import Testbed


@pytest.fixture(scope="module")
def nerf_tb(tmp_path_factory):
    import json

    from PIL import Image

    from __graft_entry__ import _tiny_sphere_dataset

    # materialize the tiny sphere scene as a real transforms.json on disk
    ds = _tiny_sphere_dataset(n_views=4, res=32)
    td = tmp_path_factory.mktemp("scene")
    from ngp_tpu.data.nerf_loader import ngp_matrix_to_nerf

    frames = []
    for i in range(ds.images.shape[0]):
        p = td / f"im_{i}.png"
        Image.fromarray(np.asarray(ds.images[i][..., :3])).save(p)
        m = ngp_matrix_to_nerf(ds.xforms[i, 0], ds.scale, ds.offset)
        m4 = np.concatenate([m, [[0, 0, 0, 1]]], 0)
        frames.append({"file_path": p.name, "transform_matrix": m4.tolist()})
    j = {
        "camera_angle_x": float(2 * np.arctan(0.5 * 32 / ds.focal_lengths[0, 0])),
        "aabb_scale": 1,
        "scale": float(ds.scale),
        "offset": [float(v) for v in ds.offset],
        "frames": frames,
    }
    with open(td / "transforms.json", "w") as f:
        json.dump(j, f)
    tb = Testbed(mode="nerf", scene=str(td / "transforms.json"),
                 batch_size=1 << 12)
    tb.train(4)
    return tb


def test_n_images_and_extrinsics_roundtrip(nerf_tb):
    tb = nerf_tb
    assert tb.n_images == 4
    m0 = tb.get_camera_extrinsics(0)
    assert m0.shape == (3, 4)
    m0_new = m0.copy()
    m0_new[:, 3] += 0.01
    tb.set_camera_extrinsics(0, m0_new)
    got = tb.get_camera_extrinsics(0)
    np.testing.assert_allclose(got, m0_new, rtol=1e-5, atol=1e-6)
    tb.set_camera_extrinsics(0, m0)  # restore


def test_set_camera_intrinsics(nerf_tb):
    tb = nerf_tb
    before = np.asarray(tb.engine.data.focals[1])
    tb.set_camera_intrinsics(1, fx=before[0] * 1.1, cx=20.0)
    after = np.asarray(tb.engine.data.focals[1])
    assert np.isclose(after[0], before[0] * 1.1)
    assert np.isclose(float(tb.engine.data.pps[1][0]), 20.0 / 32)


def test_set_image(nerf_tb):
    tb = nerf_tb
    new = np.full((32, 32, 3), 0.25, np.float32)
    tb.set_image(2, new)
    got = np.asarray(tb.engine.data.images[2])
    assert got.dtype == np.uint8
    assert abs(int(got[0, 0, 0]) - 64) <= 1
    tb.train(2)  # still trains after the swap


def test_render_with_shutter(nerf_tb):
    tb = nerf_tb
    m0 = np.asarray(tb.engine.data.xforms[0])
    m1 = np.asarray(tb.engine.data.xforms[1])
    img = tb.render(16, 16, start_matrix=m0, end_matrix=m1,
                    shutter_fraction=0.5)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()


def test_override_sdf_training_data():
    from tests.test_octree_takikawa import _cube_mesh

    from ngp_tpu.engines.sdf import SdfEngine
    from ngp_tpu.geometry.mesh import normalize_mesh

    cfg = {
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "log2_hashmap_size": 12, "base_resolution": 4},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 16,
                     "n_hidden_layers": 1},
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-3},
    }
    eng = SdfEngine(cfg, normalize_mesh(_cube_mesh(0.0, 1.0)), batch_size=256)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.2, 0.8, (512, 3)).astype(np.float32)
    # supervise with a synthetic sphere SDF
    d = np.linalg.norm(pts - 0.5, axis=-1) - 0.25
    eng.override_training_data = None
    state = eng.init_state()
    eng.override_training_data = (pts, d.astype(np.float32))
    state, loss = eng.train(state, 6)
    assert np.isfinite(float(loss))
