"""Block-NeRF pipeline test: synthesize a two-block street (each block a
different-colored sphere at a different world location), write pose.csv /
setting.json / images in the fork's layout, run per-block training, then
play back — the renderer must pick the right block per camera position and
reproduce each block's color."""

import json
import math
import os

import numpy as np
import pytest


RES = 40
FOCAL = 40.0
SPHERE_R_WORLD = 12.0  # raw world units
BLOCKS = {
    "b0": {"center": np.array([0.0, 0.0, 0.0]), "rgb": (230, 60, 40)},
    "b1": {"center": np.array([200.0, 0.0, 0.0]), "rgb": (40, 70, 230)},
}


def _lookat_nerf(eye, target):
    """Camera-to-world in the pose.csv convention: x right, y up, z
    backward (classic NeRF/OpenGL); pose.csv rows store it directly."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    upv = np.cross(right, fwd)
    m = np.zeros((3, 4), np.float32)
    m[:, 0], m[:, 1], m[:, 2], m[:, 3] = right, upv, -fwd, eye
    return m


def _render_gt(xform, center, rgb):
    u = (np.arange(RES) + 0.5) / RES
    uu, vv = np.meshgrid(u, u)
    x = (uu - 0.5) * RES / FOCAL
    y = (vv - 0.5) * RES / FOCAL
    # pose.csv convention camera rays: dir = R @ (x, -y, -1) (y up, z back)
    dc = np.stack([x, -y, -np.ones_like(x)], -1)
    d = dc @ xform[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oc = xform[:, 3] - center
    b = np.einsum("hwc,c->hw", d, oc)
    disc = b * b - (oc @ oc - SPHERE_R_WORLD**2)
    img = np.zeros((RES, RES, 4), np.uint8)
    img[disc > 0, :3] = rgb
    img[disc > 0, 3] = 255
    return img


@pytest.fixture(scope="module")
def street(tmp_path_factory):
    from PIL import Image

    root = str(tmp_path_factory.mktemp("street"))
    os.makedirs(os.path.join(root, "images"))
    for bname, spec in BLOCKS.items():
        bdir = os.path.join(root, "blocks", bname)
        os.makedirs(bdir)
        rows = ["image,fx,fy,cx,cy,m00,m01,m02,m03,m10,m11,m12,m13,m20,m21,m22,m23"]
        for i in range(10):
            ang = 2 * math.pi * i / 10
            eye = spec["center"] + np.asarray(
                [math.cos(ang), math.sin(ang), 0.35]
            ) * 40.0
            xf = _lookat_nerf(eye, spec["center"])
            img = _render_gt(xf, spec["center"], spec["rgb"])
            name = f"{bname}_{i:02d}.png"
            Image.fromarray(img, "RGBA").save(os.path.join(root, "images", name))
            vals = ",".join(f"{v:.8f}" for v in xf.reshape(-1))
            rows.append(f"{name},{FOCAL},{FOCAL},{RES/2},{RES/2},{vals}")
        with open(os.path.join(bdir, "pose.csv"), "w") as f:
            f.write("\n".join(rows))
        with open(os.path.join(bdir, "setting.json"), "w") as f:
            json.dump({"scale": 0.005, "aabb_scale": 1, "training_steps": 350}, f)
    return root


def test_load_block_data(street):
    from ngp_tpu.blocknerf import list_blocks, load_block_nerf_data

    assert list_blocks(street) == ["b0", "b1"]
    ds = load_block_nerf_data(street, "b0")
    assert ds.n_images == 10
    assert ds.aabb_scale == 1
    assert ds.n_training_steps == 350
    # middle camera centered at (0.5)³
    mid = ds.xforms[5, 0][:, 3]
    np.testing.assert_allclose(mid, 0.5, atol=0.25)
    # camera aabb in raw world coords
    lo, hi = ds.camera_aabb
    assert hi[0] - lo[0] > 50  # cameras orbit at radius 40


@pytest.mark.slow
def test_blocknerf_train_and_playback(street):
    from ngp_tpu.blocknerf import BlockNerfRenderer, train_street_view_nerf
    from ngp_tpu.testbed import default_config

    cfg = default_config("nerf")
    cfg["encoding"].update({"n_levels": 8, "log2_hashmap_size": 15,
                            "per_level_scale": 1.5})
    snaps = train_street_view_nerf(
        street, config=cfg, batch_size=1 << 14, grid_size=32,
        n_steps_per_unit=256, density_grid_decay=0.8, seed=9,
    )
    assert len(snaps) == 2 and all(os.path.exists(s) for s in snaps)

    r = BlockNerfRenderer(
        street, batch_size=1 << 14, grid_size=32,
        n_steps_per_unit=256, n_render_samples=128,
    )
    assert r.pick_block(np.asarray([0.0, 0.0, 0.0])) == 0
    assert r.pick_block(np.asarray([200.0, 5.0, 0.0])) == 1

    for bi, (bname, spec) in enumerate(BLOCKS.items()):
        eye = spec["center"] + np.asarray([40.0, 0.0, 14.0])
        xf = _lookat_nerf(eye, spec["center"])
        img, picked = r.render_at(xf, 40, 40)
        assert picked == bi
        c = img[20, 20]
        want = np.asarray(spec["rgb"]) / 255.0
        # dominant channel matches the block color
        assert np.argmax(c) == np.argmax(want), (bname, c)
        assert c[np.argmax(want)] > 0.3, (bname, c)


def test_playback_world_poses(street):
    """Playback path: smooth world poses through every block's cameras
    (the fork's Bezier drive-through, testbed.cu:3606-3675)."""
    from ngp_tpu.blocknerf import playback_world_poses

    poses = playback_world_poses(street, 24)
    assert poses.shape == (24, 3, 4)
    # frame 0 is the first recorded pose VERBATIM (raw pose.csv
    # convention — render_at applies the y/z flip itself; regression for
    # a double-flip that rendered playback facing backwards)
    import os as _os

    first_block = sorted(
        d for d in _os.listdir(_os.path.join(street, "blocks"))
        if d.startswith("b")
    )[0]
    with open(_os.path.join(street, "blocks", first_block, "pose.csv")) as f:
        row = [p for p in f.readlines()[1].split(",") if p.strip()]
    m0 = np.asarray([float(v) for v in row[5:17]], np.float32).reshape(3, 4)
    np.testing.assert_allclose(poses[0], m0, atol=1e-5)
    # rotations stay orthonormal through the slerp
    R = poses[:, :, :3]
    rtr = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                               atol=1e-3)
    # the path visits both blocks' neighborhoods (x spans the street)
    xs = poses[:, 0, 3]
    assert xs.max() - xs.min() > 50
