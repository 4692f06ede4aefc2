import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.data.nerf_loader import (
    load_nerf,
    nerf_matrix_to_ngp,
    ngp_matrix_to_nerf,
)
from ngp_tpu.geometry.aabb import AABB
from ngp_tpu.geometry.camera import (
    LENS_OPENCV,
    Lens,
    fov_to_focal_length,
    iterative_undistortion,
    opencv_lens_distortion_delta,
    uv_to_ray,
)

FOX = "/root/reference/data/nerf/fox"


def test_aabb_ray_intersect():
    box = AABB.unit()
    o = jnp.asarray([[-1.0, 0.5, 0.5], [0.5, 0.5, 0.5], [2.0, 2.0, 2.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    tmin, tmax = box.ray_intersect(o, d)
    np.testing.assert_allclose(np.asarray(tmin), [1.0, 0.0, np.inf][:2] + [np.asarray(tmin)[2]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tmax)[:2], [2.0, 0.5], rtol=1e-6)
    assert float(tmin[2]) > float(tmax[2])  # miss


def test_aabb_warp_roundtrip():
    box = AABB.from_scale(8)
    p = jnp.asarray([[0.3, -1.2, 2.0]])
    np.testing.assert_allclose(
        np.asarray(box.unwarp(box.relative_pos(p))), np.asarray(p), rtol=1e-5
    )


def test_matrix_conversion_roundtrip():
    rng = np.random.RandomState(0)
    m = rng.randn(3, 4).astype(np.float32)
    scale, offset = 0.33, np.array([0.5, 0.5, 0.5], np.float32)
    ngp = nerf_matrix_to_ngp(m, scale, offset)
    back = ngp_matrix_to_nerf(ngp, scale, offset)
    np.testing.assert_allclose(back, m, atol=1e-5)


def test_undistortion_inverts_distortion():
    params = jnp.asarray([0.0578421, -0.0805099, -0.000980296, 0.00015575, 0, 0, 0])
    u = jnp.linspace(-0.4, 0.4, 9)
    v = jnp.linspace(-0.3, 0.3, 9)
    du, dv = opencv_lens_distortion_delta(params, u, v)
    xu, xv = iterative_undistortion(
        opencv_lens_distortion_delta, params, u + du, v + dv
    )
    np.testing.assert_allclose(np.asarray(xu), np.asarray(u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xv), np.asarray(v), atol=1e-6)


def test_uv_to_ray_pinhole_center():
    cm = jnp.concatenate([jnp.eye(3), jnp.asarray([[1.0], [2.0], [3.0]])], axis=1)
    o, d = uv_to_ray(
        jnp.asarray([[0.5, 0.5]]),
        (100, 100),
        jnp.asarray([100.0, 100.0]),
        cm,
        jnp.asarray([0.5, 0.5]),
    )
    np.testing.assert_allclose(np.asarray(o[0]), [1, 2, 3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, 1], atol=1e-7)


def test_fov_focal_roundtrip():
    f = fov_to_focal_length(1080, 50.0)
    from ngp_tpu.geometry.camera import focal_length_to_fov

    np.testing.assert_allclose(focal_length_to_fov(1080, f), 50.0, rtol=1e-6)


@pytest.mark.slow
def test_load_fox_dataset():
    ds = load_nerf(FOX)
    assert ds.n_images == 50
    assert ds.resolution == (1080, 1920)
    assert ds.aabb_scale == 8
    assert ds.lens.mode == LENS_OPENCV
    np.testing.assert_allclose(ds.lens.params[0], 0.0578421, rtol=1e-5)
    assert ds.images.shape == (50, 1920, 1080, 4)
    assert ds.images.dtype == np.uint8
    np.testing.assert_allclose(ds.focal_lengths[0], [1375.52, 1374.49], rtol=1e-5)
    # camera positions should be in the [0,1]-ish cube after conversion
    cams = ds.xforms[:, 0, :, 3]
    assert cams.min() > -4 and cams.max() < 5
    # rotation should stay orthonormal after conversion
    R = ds.xforms[0, 0, :, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_camera_path_spline_and_json(tmp_path):
    """Keyframe spline: B-spline stays near control points, endpoints clamp,
    JSON round-trips with the reference schema keys."""
    import numpy as np
    from ngp_tpu.utils.camera_path import (
        CameraKeyframe, CameraPath, mat_to_quat, quat_to_mat,
    )

    # quaternion <-> matrix round trip
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = quat_to_mat(q.astype(np.float32))
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        q2 = mat_to_quat(m)
        assert abs(abs(np.dot(q, q2)) - 1) < 1e-4

    path = CameraPath()
    for i in range(4):
        m = np.eye(4)[:3]
        m[:, 3] = [i * 1.0, 0, 0]
        path.keyframes.append(CameraKeyframe.from_matrix(m, fov=40 + i * 5))

    # interior evaluation moves monotonically in x
    xs = [path.eval_camera_path(t).T[0] for t in np.linspace(0, 1, 9)]
    assert all(b >= a - 1e-5 for a, b in zip(xs, xs[1:]))
    # fov interpolates within range
    f = path.eval_camera_path(0.5).fov
    assert 40 <= f <= 55

    p = str(tmp_path / "cam.json")
    path.save(p)
    import json
    doc = json.load(open(p))
    assert "path" in doc and "R" in doc["path"][0] and "T" in doc["path"][0]
    p2 = CameraPath.load(p)
    assert len(p2.keyframes) == 4
    np.testing.assert_allclose(
        p2.eval_camera_path(0.3).matrix(), path.eval_camera_path(0.3).matrix(),
        atol=1e-6,
    )


def test_grid_at_lerp_matches_reference_semantics():
    """Buffer2DView::at_lerp (common.h:384-399): sample at uv*resolution
    with clamped corners, no half-texel offset."""
    import jax.numpy as jnp

    from ngp_tpu.geometry.camera import grid_at_lerp

    g = np.arange(3 * 4 * 2, dtype=np.float32).reshape(3, 4, 2)
    # exact texel corner: uv*res integer → pure single-texel read
    out = np.asarray(grid_at_lerp(jnp.asarray(g), jnp.asarray([[0.25, 1 / 3]])))
    np.testing.assert_allclose(out[0], g[1, 1])
    # midpoint between texels (1,1),(1,2),(2,1),(2,2)
    out = np.asarray(
        grid_at_lerp(jnp.asarray(g), jnp.asarray([[0.375, 0.5]]))
    )
    np.testing.assert_allclose(out[0], 0.25 * (g[1, 1] + g[1, 2] + g[2, 1] + g[2, 2]))
    # clamped far corner
    out = np.asarray(grid_at_lerp(jnp.asarray(g), jnp.asarray([[1.0, 1.0]])))
    np.testing.assert_allclose(out[0], g[2, 3])
    # gradient flows (bilinear deposit via autodiff transpose)
    import jax

    def f(grid):
        return grid_at_lerp(grid, jnp.asarray([[0.3, 0.4]])).sum()

    dg = jax.grad(f)(jnp.asarray(g))
    np.testing.assert_allclose(float(jnp.sum(dg)), 2.0, rtol=1e-5)


def test_ray_file_loading_and_training(tmp_path):
    """rays_<name>.dat per-pixel ray files (light-field datasets,
    src/nerf_loader.cu:623-645): loaded, converted NeRF→NGP like
    nerf_ray_to_ngp, and used by the training sampler instead of the
    camera model."""
    import json
    import math

    import jax
    from PIL import Image

    from __graft_entry__ import _default_config, _tiny_sphere_dataset
    from ngp_tpu.data.nerf_loader import load_nerf
    from ngp_tpu.engines.nerf import NerfEngine

    ds = _tiny_sphere_dataset(n_views=4, res=16)
    W, H = ds.resolution
    frames = []
    scale, offset = 1.0, np.zeros(3, np.float32)
    for i in range(4):
        name = f"v{i:02d}.png"
        Image.fromarray(np.asarray(ds.images[i])).save(str(tmp_path / name))
        xf = np.asarray(ds.xforms[i, 0])
        inv = xf[[2, 0, 1], :].copy()
        inv[:, 1] *= -1
        inv[:, 2] *= -1
        frames.append({
            "file_path": name,
            "transform_matrix": np.vstack([inv, [0, 0, 0, 1]]).tolist(),
        })
        # per-pixel rays in NeRF space: ngp→nerf is the inverse cycle
        u = (np.arange(W) + 0.5) / W
        uu, vv = np.meshgrid(u, u)
        f = float(ds.focal_lengths[i][0])
        dc = np.stack([(uu - 0.5) * W / f, (vv - 0.5) * H / f,
                       np.ones_like(uu)], -1)
        d_ngp = dc @ xf[:, :3].T
        o_ngp = np.broadcast_to(xf[:, 3], d_ngp.shape)
        # ngp→nerf: inverse of (·scale+offset)[yzx] with scale 1/offset 0
        # is the zxy cycle
        o_nerf = o_ngp[..., [2, 0, 1]]
        d_nerf = d_ngp[..., [2, 0, 1]]
        raw = np.concatenate([o_nerf, d_nerf], -1).astype(np.float32)
        raw.tofile(str(tmp_path / f"rays_v{i:02d}.dat"))

    meta = {
        "camera_angle_x": 2 * math.atan(0.5 * W / f),
        "aabb_scale": 1, "scale": scale, "offset": offset.tolist(),
        "frames": frames,
    }
    with open(tmp_path / "transforms.json", "w") as fp:
        json.dump(meta, fp)

    loaded = load_nerf(str(tmp_path / "transforms.json"))
    assert loaded.rays is not None and loaded.rays.shape == (4, H, W, 6)
    # round trip: stored rays match the NGP camera rays they encode
    np.testing.assert_allclose(
        loaded.rays[0, ..., :3], np.broadcast_to(
            np.asarray(ds.xforms[0, 0][:, 3]), (H, W, 3)
        ), atol=1e-5,
    )

    eng = NerfEngine(
        _default_config(), loaded, batch_size=1 << 10, grid_size=16,
        n_steps_per_unit=32,
    )
    assert eng.near_distance == 0.0
    state, grid = eng.init_state(), eng.init_grid()
    assert float(jnp.min(grid.density)) >= 0.0  # no frustum culling
    state, grid, m = eng.train(state, grid, 4)
    assert np.isfinite(float(m["loss"]))


def test_sharpen_on_load(tmp_path):
    """The "sharpen" key applies the reference's 5-point unsharp filter to
    HDR images at load (nerf_loader.cu:93-113, center_w = 4 + 1/amount)."""
    import json

    from ngp_tpu.data.exr import write_exr
    from ngp_tpu.data.nerf_loader import load_nerf

    rng = np.random.default_rng(0)
    img = rng.uniform(0.1, 0.9, (8, 8, 4)).astype(np.float32)
    write_exr(str(tmp_path / "a.exr"), img[..., :3])
    frame = {"file_path": "a.exr",
             "transform_matrix": np.eye(4)[:3].tolist() + [[0, 0, 0, 1]]}
    for amount in (0.0, 0.5):
        meta = {"camera_angle_x": 0.7, "aabb_scale": 1, "scale": 1.0,
                "offset": [0, 0, 0], "frames": [frame]}
        if amount:
            meta["sharpen"] = amount
        with open(tmp_path / "transforms.json", "w") as f:
            json.dump(meta, f)
        ds = load_nerf(str(tmp_path / "transforms.json"))
        if amount == 0.0:
            base = np.asarray(ds.images[0], np.float32)
        else:
            sharp = np.asarray(ds.images[0], np.float32)
    # interior pixel: out = max(0, (c*cw - l - u - r - d) / (cw - 4))
    cw = 4.0 + 1.0 / 0.5
    y, x = 4, 4
    want = (base[y, x] * cw - base[y, x - 1] - base[y - 1, x]
            - base[y, x + 1] - base[y + 1, x]) / (cw - 4.0)
    np.testing.assert_allclose(
        sharp[y, x], np.maximum(want, 0.0), rtol=2e-3, atol=2e-3
    )
    assert not np.allclose(sharp, base, atol=1e-3)
