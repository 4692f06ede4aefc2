"""Foveation warp (geometry/foveation.py) — the reference's
FoveationPiecewiseQuadratic (common_device.cuh:158-288) rebuilt as
vectorized JAX.

Convention (from the reference's "am should give 1:1 pixel mapping"
comment): the warp maps render-buffer [0,1] → full-image [0,1];
``center_pixel_steepness`` = buffer/full size ratio (≤ 1), so the slope —
full-image units crossed per buffer unit — is *smallest* at the focus
(finest sampling) and larger toward the edges."""

import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.geometry.foveation import Foveation, PiecewiseQuadratic


def test_identity_when_uniform():
    pq = PiecewiseQuadratic.make(1.0, 0.5, 0.2)
    x = jnp.linspace(0, 1, 11)
    np.testing.assert_allclose(np.asarray(pq.warp(x)), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pq.density(x)), 1.0, atol=1e-6)


@pytest.mark.parametrize("steep,center,radius", [
    (0.5, 0.5, 0.1), (0.33, 0.3, 0.05), (0.7, 0.7, 0.2),
])
def test_warp_properties(steep, center, radius):
    pq = PiecewiseQuadratic.make(steep, center, radius)
    x = jnp.linspace(0.0, 1.0, 257)
    y = np.asarray(pq.warp(x))
    # endpoints map to endpoints; monotone increasing; covers [0,1]
    assert abs(y[0]) < 1e-4 and abs(y[-1] - 1.0) < 1e-4
    assert np.all(np.diff(y) > 0)
    # unwarp inverts warp
    back = np.asarray(pq.unwarp(jnp.asarray(y)))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-4)
    # density is d(warp)/dx: compare to finite differences
    fd = np.gradient(y, np.asarray(x))
    dens = np.asarray(pq.density(x))
    np.testing.assert_allclose(dens[2:-2], fd[2:-2], rtol=0.05, atol=0.02)
    # the focus gets the finest sampling (smallest full-image step per
    # buffer pixel); edges are compressed
    ci = int(np.argmin(np.abs(back - pq.unwarp(jnp.asarray([center]))[0])))
    assert dens[ci] < dens[2] and dens[ci] < dens[-3]


def test_foveation_2d_roundtrip():
    fov = Foveation.make((0.5, 0.6), (0.5, 0.4), 0.1)
    uv = jnp.asarray(np.random.default_rng(0).random((64, 2)), jnp.float32)
    w = fov.warp(uv)
    back = fov.unwarp(w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-4)
    d = np.asarray(fov.density(uv))
    assert np.all(d > 0)


def test_foveated_render_close_to_full_at_focus():
    import tests.test_render_modes as trm

    eng, state, grid = trm.trained.__wrapped__()
    fov = Foveation.make(0.6, 0.5, 0.15)
    xf = np.asarray(eng.data.xforms[0])
    f = np.asarray(eng.data.focals[0])
    full, _, _ = eng.render_view(state, grid, xf, f, width=32, height=32)
    fov_img, (wb, hb) = eng.render_view_foveated(
        state, grid, xf, f, fov, width=32, height=32, buffer_scale=0.6
    )
    assert fov_img.shape == (32, 32, 3) and wb < 32
    c = np.asarray(full)[12:20, 12:20]
    cf = np.asarray(fov_img)[12:20, 12:20]
    # center (finest sampling) should closely match the non-foveated render
    assert np.abs(c - cf).mean() < 0.08
