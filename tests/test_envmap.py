"""Trainable latlong envmap background (envmap.cuh, the envmap trainer in
src/testbed.cu:4101-4110): the uv mapping matches the reference math and a
synthetic sky is actually learned through training."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.data.nerf_loader import NerfDataset
from ngp_tpu.engines.nerf import NerfEngine
from ngp_tpu.geometry.camera import Lens
from ngp_tpu.ops.envmap import dir_to_latlong_uv, read_envmap

from test_nerf_engine import (
    CONFIG,
    FOCAL,
    RES,
    SPHERE_C,
    SPHERE_R,
    SPHERE_RGB,
    _lookat_xform,
)


def test_latlong_uv_matches_reference_anchors():
    # reference swizzle (z, -x, y): +y world → swizzled z=+1 → theta 0 (top)
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    th, ph = dir_to_latlong_uv(up)
    assert abs(float(th[0])) < 1e-6
    dn = jnp.asarray([[0.0, -1.0, 0.0]])
    th, _ = dir_to_latlong_uv(dn)
    assert abs(float(th[0]) - 1.0) < 1e-6
    # +z world → swizzled (1, 0, 0) → phi = atan2(0, 1) = 0 → u = 0.5
    fz = jnp.asarray([[0.0, 0.0, 1.0]])
    th, ph = dir_to_latlong_uv(fz)
    assert abs(float(ph[0]) - 0.5) < 1e-6 and abs(float(th[0]) - 0.5) < 1e-6


def test_read_envmap_bilinear_and_wrap():
    H, W = 8, 16
    img = np.zeros((H, W, 4), np.float32)
    img[:, :, 0] = np.linspace(0, 1, W)[None, :]
    img[:, :, 3] = 1.0
    out = read_envmap(jnp.asarray(img), jnp.asarray([[0.0, 0.0, 1.0]]))
    # u=0.5 → x = 7.5 → halfway between columns 7 and 8
    expect = 0.5 * (img[4, 7, 0] + img[4, 8, 0])
    assert abs(float(out[0, 0]) - expect) < 1e-5


def _sky_srgb(d):
    """Analytic sRGB sky color as a function of world dir."""
    t = (d[..., 2] + 1.0) * 0.5
    return np.stack(
        [0.2 + 0.6 * t, 0.4 + 0.2 * t, 0.8 - 0.5 * t], axis=-1
    ).astype(np.float32)


def _render_gt_with_sky(xform):
    u = (np.arange(RES) + 0.5) / RES
    uu, vv = np.meshgrid(u, u)
    x = (uu - 0.5) * RES / FOCAL
    y = (vv - 0.5) * RES / FOCAL
    dir_cam = np.stack([x, y, np.ones_like(x)], -1)
    d = dir_cam @ xform[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = xform[:, 3]
    oc = o - SPHERE_C
    b = np.einsum("hwc,c->hw", d, oc)
    disc = b * b - (np.dot(oc, oc) - SPHERE_R**2)
    hit = disc > 0
    img = np.empty((RES, RES, 4), np.float32)
    img[..., :3] = _sky_srgb(d)
    img[hit, :3] = SPHERE_RGB
    img[..., 3] = 1.0  # fully opaque: sky is "seen", not alpha-masked
    return (img * 255).astype(np.uint8), d


def test_envmap_learns_synthetic_sky():
    n_views = 8
    xforms, images = [], []
    dirs_all = []
    for i in range(n_views):
        ang = 2 * math.pi * i / n_views
        eye = SPHERE_C + np.asarray(
            [math.cos(ang), math.sin(ang), 0.25 * math.sin(2 * ang)], np.float32
        ) * 1.1
        xf = _lookat_xform(eye, SPHERE_C)
        img, d = _render_gt_with_sky(xf)
        xforms.append(np.stack([xf, xf]))
        images.append(img)
        dirs_all.append(d.reshape(-1, 3))
    ds = NerfDataset(
        images=np.stack(images),
        xforms=np.stack(xforms),
        focal_lengths=np.full((n_views, 2), FOCAL, np.float32),
        principal_points=np.full((n_views, 2), 0.5, np.float32),
        lens=Lens(),
        resolution=(RES, RES),
        aabb_scale=1,
    )
    # density_grid_decay calibration: this test needs fast occupancy
    # erosion so the transient "sky fog" (density explaining the sky —
    # the classic NeRF background degeneracy) is pruned before it locks
    # in and the envmap wins the explanation. The original 0.8 was
    # calibrated against the round-2 schedule, which ALSO ran decay-only
    # passes every 4 steps (0.8^4 ≈ 0.41 per 16-step update period); the
    # reference prep cadence (upstream parity, default since round 3)
    # applies decay only inside the 16-step update, so the same erosion
    # rate is expressed directly as 0.41. Training runs 400 steps — the
    # deterministic stride-residue refresh prunes with less variance
    # (no lucky mass-extinction events), so the envmap needs ~50 more
    # steps to cross the same bar. The 0.08 assertion is unchanged.
    eng = NerfEngine(
        dict(CONFIG), ds, batch_size=1 << 13, grid_size=16,
        n_steps_per_unit=128, density_grid_decay=0.41, seed=23,
        train_envmap=True, envmap_resolution=(32, 64),
        train_with_random_bg=False,
    )
    state, grid = eng.init_state(), eng.init_grid()
    assert "envmap" in state.params
    state, grid, m = eng.train(state, grid, 400)
    assert np.isfinite(float(m["loss"]))

    # The learned envmap (linear) should reproduce the sky at observed dirs.
    from ngp_tpu.ops.tonemap import linear_to_srgb

    probe = jnp.asarray(np.concatenate(dirs_all)[:: 997][:64])
    env = read_envmap(eng.inference_params(state)["envmap"]["image"], probe)
    got = np.asarray(linear_to_srgb(jnp.maximum(env[:, :3], 0.0)))
    want = _sky_srgb(np.asarray(probe))
    err = np.abs(got - want).mean()
    assert err < 0.08, f"envmap mean sRGB error {err:.3f}"
