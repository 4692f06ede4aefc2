"""Block-NeRF street-view pipeline — the yblin fork's headline feature.

The fork trains one NeRF per city "block" and plays back a drive-through by
hot-swapping block models (``Testbed::train_street_view_nerf``
``src/testbed.cu:377-418``, block snapshots ``505-611``, playback
``3606-3675``). Reproduced here:

* ``load_block_nerf_data``: ``blocks/<b>/pose.csv`` (header; rows =
  image, fx, fy, cx, cy, 12 row-major camera-to-world entries) +
  ``setting.json`` (scale default 0.02, aabb_scale default 4,
  training_steps); world offset centers the middle camera at (0.5,)³ and
  the camera AABB is kept in raw world coordinates
  (``src/nerf_loader.cu:731-905``).
* ``train_street_view_nerf``: per-block NeRF training + block snapshot
  (params, fp16 density grid, scale/offset, camera/nerf AABBs).
* ``BlockNerfRenderer``: loads block snapshots, picks the nearest block
  for a raw-world camera pose (the fork picks by camera-AABB distance) and
  renders through a hot-swapped engine.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from ngp_tpu.data.nerf_loader import NerfDataset, nerf_matrix_to_ngp
from ngp_tpu.geometry.camera import Lens


def load_block_nerf_data(root: str, block_name: str) -> NerfDataset:
    from PIL import Image

    block_path = os.path.join(root, "blocks", block_name)
    pose_csv = os.path.join(block_path, "pose.csv")
    with open(pose_csv) as f:
        lines = [l.strip() for l in f.readlines()][1:]  # skip header

    paths, mats, focals, pps, cam_pos = [], [], [], [], []
    for line in lines:
        parts = [p.strip() for p in line.split(",") if p.strip() != ""]
        if not parts:
            continue
        assert len(parts) >= 17, f"bad pose.csv row: {line!r}"
        paths.append(os.path.join(root, "images", parts[0]))
        focals.append((float(parts[1]), float(parts[2])))
        pps.append((float(parts[3]), float(parts[4])))
        vals = [float(v) for v in parts[5:17]]
        m = np.asarray(vals, np.float32).reshape(3, 4)
        mats.append(m)
        cam_pos.append(m[:, 3].copy())

    if not paths:
        raise ValueError(f"no rows in {pose_csv}")

    setting_path = os.path.join(block_path, "setting.json")
    if not os.path.exists(setting_path):
        setting_path = os.path.join(root, "blocks", "setting.json")
    with open(setting_path) as f:
        setting = json.load(f)
    scale = float(setting.get("scale", 0.02))
    aabb_scale = int(setting.get("aabb_scale", 4))
    n_training_steps = int(setting.get("training_steps", 10000))
    n_extra = int(setting.get("n_extra_learnable_dims", 0))

    cam_pos = np.stack(cam_pos)
    cam_aabb = (cam_pos.min(axis=0), cam_pos.max(axis=0))
    center = cam_pos[len(cam_pos) // 2] * scale
    offset = np.float32(0.5) - center.astype(np.float32)

    imgs = []
    for p in paths:
        with Image.open(p) as im:
            imgs.append(np.asarray(im.convert("RGBA"), np.uint8))
    H, W = imgs[0].shape[:2]
    images = np.stack(imgs)

    n = len(paths)
    xforms = np.zeros((n, 2, 3, 4), np.float32)
    for i, m in enumerate(mats):
        # The reference negates columns 1/2 manually and then calls
        # nerf_matrix_to_ngp (which negates them again — net no flip,
        # just scale/offset + axis cycle). Pre-negate to cancel ours.
        m2 = m.copy()
        m2[:, 1] *= -1.0
        m2[:, 2] *= -1.0
        xforms[i, 0] = xforms[i, 1] = nerf_matrix_to_ngp(m2, scale, offset)
    fl = np.asarray(focals, np.float32)
    pp = np.asarray(pps, np.float32) / np.asarray([W, H], np.float32)

    ds = NerfDataset(
        images=images,
        xforms=xforms,
        focal_lengths=fl,
        principal_points=pp,
        lens=Lens(),
        resolution=(W, H),
        scale=scale,
        offset=offset,
        aabb_scale=aabb_scale,
        paths=paths,
        n_extra_learnable_dims=n_extra,
    )
    ds.camera_aabb = cam_aabb  # raw world coords, like the reference
    ds.n_training_steps = n_training_steps
    return ds


def playback_world_poses(root: str, n_frames: int) -> np.ndarray:
    """Smooth drive-through path through every block's recorded cameras —
    the fork's Bezier playback (``Testbed::frame``, ``testbed.cu:
    3606-3675``). Returns (n_frames, 3, 4) raw-world camera-to-world
    matrices in pose.csv's own convention — exactly what
    ``BlockNerfRenderer.render_at`` takes (it applies the y/z column flip
    itself before ``nerf_matrix_to_ngp``)."""
    mats = []
    for block in list_blocks(root):
        pose_csv = os.path.join(root, "blocks", block, "pose.csv")
        with open(pose_csv) as f:
            lines = [l.strip() for l in f.readlines()][1:]
        for line in lines:
            parts = [p.strip() for p in line.split(",") if p.strip() != ""]
            if not parts:
                continue
            m = np.asarray(
                [float(v) for v in parts[5:17]], np.float32
            ).reshape(3, 4)
            mats.append(m)
    if len(mats) < 2:
        return np.repeat(np.asarray(mats, np.float32), n_frames, axis=0)
    mats = np.stack(mats)  # (P, 3, 4)

    # Catmull-Rom positions + pairwise rotation slerp along the key poses
    import jax.numpy as jnp

    from ngp_tpu.engines.nerf import _lerp_xforms

    P = mats.shape[0]
    t = np.linspace(0.0, P - 1.0, n_frames)
    i0 = np.clip(t.astype(np.int64), 0, P - 2)
    frac = (t - i0).astype(np.float32)
    a = jnp.asarray(mats[i0])
    b = jnp.asarray(mats[i0 + 1])
    out = np.array(_lerp_xforms(a, b, jnp.asarray(frac)))
    # smooth positions with a Catmull-Rom pass over the lerped track
    pos = out[:, :, 3]
    if n_frames > 4:
        sm = pos.copy()
        sm[1:-1] = 0.25 * pos[:-2] + 0.5 * pos[1:-1] + 0.25 * pos[2:]
        out[:, :, 3] = sm
    return out


def list_blocks(root: str) -> list[str]:
    bdir = os.path.join(root, "blocks")
    return sorted(
        b for b in os.listdir(bdir)
        if b.startswith("b") and os.path.isdir(os.path.join(bdir, b))
    )


def save_block_nerf(path: str, engine, state, grid, dataset) -> None:
    """Block snapshot with camera/nerf AABBs (``save_block_nerf``,
    ``testbed.cu:505-545``)."""
    import jax

    from ngp_tpu.utils.snapshot import save_snapshot

    render_aabb = (np.asarray(engine.aabb.min), np.asarray(engine.aabb.max))
    nerf_aabb = (
        (render_aabb[0] - dataset.offset) / dataset.scale,
        (render_aabb[1] - dataset.offset) / dataset.scale,
    )
    save_snapshot(
        path,
        {
            "mode": "nerf",
            "network_config": engine.config,
            "snapshot": {
                "training_step": np.asarray(state.step),
                "params": jax.tree.map(np.asarray, state.params),
                "ema_params": jax.tree.map(np.asarray, state.ema.params),
                "density_grid": np.asarray(grid.density, np.float16),
                "density_grid_mean": np.asarray(grid.mean_density),
                "nerf": {
                    "aabb_scale": engine.aabb_scale,
                    "scale": float(dataset.scale),
                    "offset": np.asarray(dataset.offset),
                    "n_extra_learnable_dims": dataset.n_extra_learnable_dims,
                },
                "camera_aabb": np.asarray(dataset.camera_aabb),
                "nerf_aabb": np.asarray(nerf_aabb),
            },
        },
    )


def train_street_view_nerf(
    root: str,
    config: dict | None = None,
    n_steps_override: int | None = None,
    log=print,
    block_shard: tuple[int, int] | None = None,
    **engine_kwargs,
):
    """Batch per-block training (``train_street_view_nerf``): trains every
    ``blocks/b*`` and writes ``blocks/<b>/nerf.ingp``. Returns the list of
    snapshot paths.

    ``block_shard=(i, n)`` trains only every n-th block starting at i —
    blocks are independent, so a fleet of processes (one per host/chip)
    splits a city embarrassingly. The fork trains blocks strictly
    serially (``testbed.cu:377-418``)."""
    from ngp_tpu.engines.nerf import NerfEngine
    from ngp_tpu.testbed import default_config

    blocks = list_blocks(root)
    if block_shard is not None:
        i, nshards = block_shard
        blocks = blocks[i::nshards]
    out = []
    for block in blocks:
        log(f"Training block: {block}")
        ds = load_block_nerf_data(root, block)
        cfg = config or default_config("nerf")
        engine = NerfEngine(dict(cfg), ds, **engine_kwargs)
        state = engine.init_state()
        grid = engine.init_grid()
        n = n_steps_override or ds.n_training_steps
        state, grid, metrics = engine.train(state, grid, n)
        log(f"  block {block}: {n} steps, loss={float(metrics['loss']):.5f}")
        snap = os.path.join(root, "blocks", block, "nerf.ingp")
        save_block_nerf(snap, engine, state, grid, ds)
        out.append(snap)
    return out


@dataclass
class BlockNerfModel:
    path: str
    camera_aabb: np.ndarray  # (2, 3) raw world
    nerf_aabb: np.ndarray
    scale: float
    offset: np.ndarray
    aabb_scale: int
    config: dict

    def camera_center(self) -> np.ndarray:
        return self.camera_aabb.mean(axis=0)


class BlockNerfRenderer:
    """Playback: pick the block whose camera AABB is closest to the query
    pose (``Testbed::frame`` playback loop, ``testbed.cu:3606-3675``) and
    render through a hot-swapped engine (``set_block_nerf``)."""

    def __init__(self, root: str, **engine_kwargs):
        from ngp_tpu.utils.snapshot import load_snapshot

        self.root = root
        self.models: list[BlockNerfModel] = []
        self._engine_kwargs = engine_kwargs
        for block in list_blocks(root):
            p = os.path.join(root, "blocks", block, "nerf.ingp")
            if not os.path.exists(p):
                continue
            doc = load_snapshot(p)
            snap = doc["snapshot"]
            self.models.append(
                BlockNerfModel(
                    path=p,
                    camera_aabb=np.asarray(snap["camera_aabb"], np.float32),
                    nerf_aabb=np.asarray(snap["nerf_aabb"], np.float32),
                    scale=float(snap["nerf"]["scale"]),
                    offset=np.asarray(snap["nerf"]["offset"], np.float32),
                    aabb_scale=int(snap["nerf"]["aabb_scale"]),
                    config=doc["network_config"],
                )
            )
        if not self.models:
            raise ValueError(f"no block snapshots under {root}/blocks")
        self._active: int | None = None
        self._engine = None
        self._state = None
        self._grid = None

    def pick_block(self, world_pos: np.ndarray) -> int:
        """Nearest block by signed distance to its camera AABB."""
        best, best_d = 0, np.inf
        for i, m in enumerate(self.models):
            lo, hi = m.camera_aabb
            q = np.maximum(np.maximum(lo - world_pos, 0), world_pos - hi)
            d = float(np.linalg.norm(q))
            if d < best_d:
                best, best_d = i, d
        return best

    def set_block_nerf(self, index: int) -> None:
        if index == self._active:
            return
        from ngp_tpu.data.nerf_loader import NerfDataset
        from ngp_tpu.engines.nerf import NerfEngine
        from ngp_tpu.geometry.camera import Lens

        m = self.models[index]
        dummy = NerfDataset(
            images=np.zeros((1, 8, 8, 4), np.uint8),
            xforms=np.zeros((1, 2, 3, 4), np.float32),
            focal_lengths=np.full((1, 2), 8.0, np.float32),
            principal_points=np.full((1, 2), 0.5, np.float32),
            lens=Lens(),
            resolution=(8, 8),
            scale=m.scale,
            offset=m.offset,
            aabb_scale=m.aabb_scale,
        )
        if (
            self._engine is None
            or self._engine.aabb_scale != m.aabb_scale
            or self._engine.config != m.config
        ):
            self._engine = NerfEngine(dict(m.config), dummy, **self._engine_kwargs)
        self._state, self._grid = self._engine.load_snapshot(m.path)
        self._active = index

    def render_at(self, world_xform: np.ndarray, width: int, height: int,
                  fov_deg: float = 50.0):
        """Render from a raw-world camera-to-world (3, 4) matrix (NeRF
        axis convention, like pose.csv rows after the y/z flip)."""
        import jax.numpy as jnp

        idx = self.pick_block(np.asarray(world_xform)[:, 3])
        self.set_block_nerf(idx)
        m = self.models[idx]
        w = np.asarray(world_xform, np.float32).copy()
        w[:, 1] *= -1.0  # cancel nerf_matrix_to_ngp's column flips —
        w[:, 2] *= -1.0  # pose.csv-convention matrices keep their signs
        ngp_xform = nerf_matrix_to_ngp(w, m.scale, m.offset)

        f = 0.5 * height / np.tan(0.5 * np.radians(fov_deg))
        xs = (np.arange(width) + 0.5) / width
        ys = (np.arange(height) + 0.5) / height
        px, py = np.meshgrid(xs, ys)
        x = (px - 0.5) * width / f
        y = (py - 0.5) * height / f
        dc = np.stack([x, y, np.ones_like(x)], -1).reshape(-1, 3)
        d = dc @ ngp_xform[:, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(ngp_xform[:, 3], d.shape)
        rgb, depth, opa = self._engine.render_rays(
            self._state, self._grid,
            jnp.asarray(o.astype(np.float32)), jnp.asarray(d.astype(np.float32)),
        )
        return np.asarray(rgb).reshape(height, width, 3), idx
