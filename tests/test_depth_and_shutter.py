"""Depth supervision + rolling-shutter training features
(src/testbed_nerf.cu:1848-1856/1953, common_device.cuh:401-408)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.data.nerf_loader import NerfDataset
from ngp_tpu.engines.nerf import NerfEngine, _lerp_xforms, _mat_to_quat, _quat_to_mat
from ngp_tpu.geometry.camera import Lens

from test_nerf_engine import (
    CONFIG,
    FOCAL,
    RES,
    SPHERE_C,
    SPHERE_R,
    _lookat_xform,
    _make_dataset,
    _render_gt,
)


def _rot_z(a):
    c, s = math.cos(a), math.sin(a)
    return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        a = rng.uniform(0, math.pi)
        K = np.asarray([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + math.sin(a) * K + (1 - math.cos(a)) * (K @ K)
        q = _mat_to_quat(jnp.asarray(R[None].astype(np.float32)))
        R2 = np.asarray(_quat_to_mat(q))[0]
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_lerp_xforms_endpoints_and_midpoint():
    xa = np.zeros((1, 3, 4), np.float32)
    xa[0, :, :3] = np.eye(3)
    xb = np.zeros((1, 3, 4), np.float32)
    xb[0, :, :3] = _rot_z(math.pi / 2)
    xb[0, :, 3] = (1.0, 2.0, 3.0)

    out0 = np.asarray(_lerp_xforms(jnp.asarray(xa), jnp.asarray(xb), jnp.asarray([0.0])))
    out1 = np.asarray(_lerp_xforms(jnp.asarray(xa), jnp.asarray(xb), jnp.asarray([1.0])))
    outh = np.asarray(_lerp_xforms(jnp.asarray(xa), jnp.asarray(xb), jnp.asarray([0.5])))
    np.testing.assert_allclose(out0[0], xa[0], atol=1e-5)
    np.testing.assert_allclose(out1[0], xb[0], atol=1e-5)
    # halfway: 45° about z, half translation — slerp of a single-axis
    # rotation is the half-angle rotation
    np.testing.assert_allclose(outh[0, :, :3], _rot_z(math.pi / 4), atol=1e-5)
    np.testing.assert_allclose(outh[0, :, 3], (0.5, 1.0, 1.5), atol=1e-5)


def _depth_gt(xform):
    """Analytic z-depth map of the test sphere (0 where no hit)."""
    u = (np.arange(RES) + 0.5) / RES
    uu, vv = np.meshgrid(u, u)
    x = (uu - 0.5) * RES / FOCAL
    y = (vv - 0.5) * RES / FOCAL
    dir_cam = np.stack([x, y, np.ones_like(x)], -1)
    norm = np.linalg.norm(dir_cam, axis=-1)
    d = dir_cam @ xform[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = xform[:, 3]
    oc = o - SPHERE_C
    b = np.einsum("hwc,c->hw", d, oc)
    disc = b * b - (np.dot(oc, oc) - SPHERE_R**2)
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))  # distance along normalized d
    z = np.where(hit, t / norm, 0.0)  # back to z-depth convention
    return z.astype(np.float32)


def test_depth_supervision_trains_and_matches_gt_depth():
    ds = _make_dataset(n_views=8)
    depths = np.stack([_depth_gt(ds.xforms[i, 0]) for i in range(8)])
    ds = NerfDataset(
        images=ds.images, xforms=ds.xforms, focal_lengths=ds.focal_lengths,
        principal_points=ds.principal_points, lens=Lens(),
        resolution=ds.resolution, aabb_scale=1, depths=depths,
    )
    eng = NerfEngine(
        dict(CONFIG), ds, batch_size=1 << 13, grid_size=16,
        n_steps_per_unit=128, density_grid_decay=0.8, seed=13,
        depth_supervision_lambda=0.5,
    )
    assert eng.data.depths is not None
    state, grid = eng.init_state(), eng.init_grid()
    state, grid, metrics = eng.train(state, grid, 250)
    assert float(metrics["loss"]) < 0.01

    # rendered depth at the sphere-facing center ray ≈ analytic distance
    o = jnp.asarray([[1.6, 0.5, 0.5]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    o_, d_ = jnp.tile(o, (64, 1)), jnp.tile(d, (64, 1))
    rgb, depth, opa = eng.render_rays(state, grid, o_, d_)
    assert float(opa[0]) > 0.8
    gt_t = 1.1 - SPHERE_R
    assert abs(float(depth[0]) - gt_t) < 0.05


def test_rolling_shutter_smoke_and_motion_blur_xform_use():
    """A dataset whose end xform differs must route rays through the pose
    lerp (xforms_end wired) and still train to a finite, decreasing loss."""
    ds0 = _make_dataset(n_views=6)
    xf = ds0.xforms.copy()
    # end pose: slight rotation about z around the scene center
    for i in range(xf.shape[0]):
        eye = xf[i, 0, :, 3]
        eye2 = SPHERE_C + _rot_z(0.02) @ (eye - SPHERE_C)
        xf[i, 1] = _lookat_xform(eye2.astype(np.float32), SPHERE_C)
    ds = NerfDataset(
        images=ds0.images, xforms=xf, focal_lengths=ds0.focal_lengths,
        principal_points=ds0.principal_points, lens=Lens(),
        resolution=ds0.resolution, aabb_scale=1,
        rolling_shutter=(0.0, 0.0, 0.0, 1.0),  # pure motion blur
    )
    eng = NerfEngine(
        dict(CONFIG), ds, batch_size=1 << 12, grid_size=16,
        n_steps_per_unit=128, density_grid_decay=0.8, seed=17,
    )
    assert eng.data.xforms_end is not None
    state, grid = eng.init_state(), eng.init_grid()
    state, grid, m = eng.train(state, grid, 60)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < 0.05
