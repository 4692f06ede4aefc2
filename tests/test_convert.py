"""Dataset converter tests (COLMAP / NSVF / Record3D / NeRFCapture →
transforms.json; reference scripts/{colmap2nerf,nsvf2nerf,record3d2nerf,
nerfcapture2nerf}.py)."""

import json
import math
import os

import numpy as np
import pytest

from ngp_tpu.data.convert import (
    colmap_to_transforms,
    nerfcapture_to_transforms,
    nsvf_to_transforms,
    parse_colmap_cameras,
    qvec2rotmat,
    record3d_to_transforms,
    reorient_and_rescale,
    sharpness,
)


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


def _look_at_c2w(eye, target, up=(0, 0, 1)):
    """COLMAP/CV-style c2w: +z forward, +y down, +x right."""
    eye, target = np.asarray(eye, float), np.asarray(target, float)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, float))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, down, fwd, eye
    return m


def _rotmat_to_quat(R):
    """Robust rotmat → (w, x, y, z) via the largest-diagonal branch."""
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        return (s / 4, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                (R[1, 0] - R[0, 1]) / s)
    i = int(np.argmax([R[0, 0], R[1, 1], R[2, 2]]))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = math.sqrt(max(0.0, 1.0 + R[i, i] - R[j, j] - R[k, k])) * 2
    q = [0.0, 0.0, 0.0, 0.0]
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = s / 4
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return tuple(q)


def _make_colmap_scene(tmp_path, n=8):
    """Synthetic ring of cameras looking at the origin, written as a
    COLMAP text model (w2c quaternion convention)."""
    text = tmp_path / "colmap_text"
    text.mkdir()
    _write(
        text / "cameras.txt",
        "# camera list\n"
        "1 OPENCV 640 480 500.0 510.0 320.0 240.0 0.01 -0.002 0.0001 0.0002\n",
    )
    lines = ["# image list"]
    for i in range(n):
        a = 2 * math.pi * i / n
        eye = [3 * math.cos(a), 3 * math.sin(a), 1.0]
        c2w = _look_at_c2w(eye, [0, 0, 0])
        w2c = np.linalg.inv(c2w)
        R, t = w2c[:3, :3], w2c[:3, 3]
        w, x, y, z = _rotmat_to_quat(R)
        lines.append(
            f"{i+1} {w} {x} {y} {z} {t[0]} {t[1]} {t[2]} 1 img_{i}.jpg"
        )
        lines.append("0 0 -1")  # 2D points line (skipped by parser)
    _write(text / "images.txt", "\n".join(lines) + "\n")
    return str(text)


def test_qvec_roundtrip():
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0])  # 45° about y
    R = qvec2rotmat(q)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_colmap_cameras_models(tmp_path):
    p = tmp_path / "cameras.txt"
    _write(p, "1 SIMPLE_RADIAL 2048 1536 1580.46 1024 768 0.0045691\n")
    c = parse_colmap_cameras(str(p))
    assert c["fl_x"] == c["fl_y"] == 1580.46
    assert c["k1"] == 0.0045691 and not c["is_fisheye"]
    _write(p, "1 OPENCV_FISHEYE 3840 2160 1800 1810 1920 1080 0.1 0.01 0.001 0.0001\n")
    c = parse_colmap_cameras(str(p))
    assert c["is_fisheye"] and c["k4"] == 0.0001 and c["fl_y"] == 1810


def test_colmap_to_transforms_geometry(tmp_path):
    text = _make_colmap_scene(tmp_path)
    out = colmap_to_transforms(text, str(tmp_path / "images"), aabb_scale=16,
                               compute_sharpness=False)
    assert out["aabb_scale"] == 16
    assert len(out["frames"]) == 8
    assert out["k1"] == 0.01 and out["p2"] == 0.0002
    # after reorientation+rescale: avg camera distance from origin == 4
    pos = np.stack(
        [np.asarray(f["transform_matrix"])[:3, 3] for f in out["frames"]]
    )
    assert np.isclose(np.linalg.norm(pos, axis=1).mean(), 4.0, atol=1e-3)
    # cameras look at a common center: rays through origin
    for f in out["frames"]:
        m = np.asarray(f["transform_matrix"])
        o, d = m[:3, 3], m[:3, 2]
        t = -np.dot(o, d) / np.dot(d, d)
        assert np.linalg.norm(o + t * d) < 0.5  # near the origin

    # converted output loads through the framework's loader
    from PIL import Image

    from ngp_tpu.data.nerf_loader import load_nerf

    (tmp_path / "images").mkdir(exist_ok=True)
    for i in range(8):
        Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(
            tmp_path / "images" / f"img_{i}.jpg"
        )
        out["frames"][i]["file_path"] = f"images/img_{i}.jpg"
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump(out, f)
    ds = load_nerf(str(tmp_path / "transforms.json"))
    assert ds.images.shape[0] == 8


def test_colmap_keep_coords(tmp_path):
    text = _make_colmap_scene(tmp_path)
    out = colmap_to_transforms(text, "images", keep_colmap_coords=True,
                               compute_sharpness=False)
    pos = np.stack(
        [np.asarray(f["transform_matrix"])[:3, 3] for f in out["frames"]]
    )
    # no rescale in this mode: ring radius sqrt(9+1) preserved
    assert np.allclose(np.linalg.norm(pos, axis=1), math.sqrt(10.0), atol=1e-6)


def test_reorient_and_rescale_up():
    rng = np.random.default_rng(0)
    frames = []
    for _ in range(6):
        m = np.eye(4)
        m[:3, 1] = [0, 1, 0.1]  # up ≈ +y
        m[:3, 3] = rng.uniform(-2, 2, 3)
        frames.append({"transform_matrix": m})
    reorient_and_rescale(frames)
    up = np.mean([f["transform_matrix"][:3, 1] for f in frames], axis=0)
    up /= np.linalg.norm(up)
    assert up[2] > 0.99  # rotated to +z


def test_sharpness(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    sharp = (rng.uniform(size=(64, 64)) * 255).astype(np.uint8)
    blurry = np.full((64, 64), 128, np.uint8)
    Image.fromarray(sharp).save(tmp_path / "sharp.png")
    Image.fromarray(blurry).save(tmp_path / "blurry.png")
    assert sharpness(str(tmp_path / "sharp.png")) > sharpness(
        str(tmp_path / "blurry.png")
    )


def test_nsvf_to_transforms(tmp_path):
    from PIL import Image

    scene = tmp_path
    (scene / "rgb").mkdir()
    (scene / "pose").mkdir()
    img = Image.fromarray(np.zeros((48, 64, 3), np.uint8))
    for split, idx in [("0", 0), ("0", 1), ("2", 0)]:
        img.save(scene / "rgb" / f"{split}_{idx:04d}.png")
        m = np.eye(4)
        m[:3, 3] = [idx * 0.5, 1.0, 2.0]
        _write(
            scene / "pose" / f"{split}_{idx:04d}.txt",
            " ".join(str(v) for v in m.reshape(-1)),
        )
    _write(scene / "intrinsics.txt", "100.0 32.0 24.0 0.\n0. 0. 0.\n0.\n1.\n")
    _write(scene / "bbox.txt", "-1 -1 -1 1 1 1 0.1\n")
    splits = nsvf_to_transforms(str(scene))
    assert set(splits) == {"train", "test"}
    assert len(splits["train"]["frames"]) == 2
    assert splits["train"]["fl_x"] == 100.0
    m = np.asarray(splits["test"]["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)


def test_record3d_to_transforms(tmp_path):
    from PIL import Image

    (tmp_path / "rgbd").mkdir()
    img = Image.fromarray(np.zeros((32, 24, 3), np.uint8))
    poses = []
    for i in range(4):
        img.save(tmp_path / "rgbd" / f"{i}.jpg")
        a = 2 * math.pi * i / 4
        eye = [2 * math.cos(a), 2 * math.sin(a), 0.5]
        c2w = _look_at_c2w(eye, [0, 0, 0])
        w, x, y, z = _rotmat_to_quat(c2w[:3, :3])
        poses.append([x, y, z, w, *eye])
    meta = {"poses": poses, "K": [100, 0, 0, 0, 110, 0, 12, 16, 1],
            "w": 24, "h": 32}
    _write(tmp_path / "metadata", json.dumps(meta))
    out = record3d_to_transforms(str(tmp_path))
    assert len(out["frames"]) == 4
    assert out["fl_x"] == 100 and out["fl_y"] == 110
    pos = np.stack(
        [np.asarray(f["transform_matrix"])[:3, 3] for f in out["frames"]]
    )
    assert np.isclose(np.linalg.norm(pos, axis=1).mean(), 4.0, atol=1e-2)


def test_nerfcapture_to_transforms():
    frames = [
        {"file_path": f"images/{i}.png", "fl_x": 500, "fl_y": 505,
         "cx": 320, "cy": 240, "transform_matrix": np.eye(4),
         "depth_path": f"images/{i}.depth.png"}
        for i in range(3)
    ]
    out = nerfcapture_to_transforms(frames, 640, 480, depth_scale=10.0)
    assert len(out["frames"]) == 3
    assert out["integer_depth_scale"] == pytest.approx(10.0 / 65535.0)
    assert out["frames"][0]["depth_path"] == "images/0.depth.png"
    json.dumps(out)  # fully serializable
