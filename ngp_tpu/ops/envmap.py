"""Latlong environment-map read (+ trainable background support).

Reproduces ``envmap.cuh`` exactly: directions are swizzled ``(z, -x, y)``,
mapped with ``dir_to_spherical_unorm`` (``random_val.cuh:61-71``) to
``(theta/π, phi/2π + 0.5)``, then bilinearly sampled at
``(phi·(W−1), theta·(H−1))`` with x-wrap and y-clamp
(``envmap.cuh:29-56``). The read is plain differentiable JAX: the forward
is a 4-corner gather, and autodiff's transpose gives the same 4-corner
gradient deposit as ``deposit_envmap_gradient`` (``envmap.cuh:58-96``) —
at ~4·n_rays elements per step the scatter is far off the hot path.

The reference keeps the envmap in linear HDR and trains it through the
sRGB background compositing (the ``srgb_to_linear_derivative`` division in
``testbed_nerf.cu:1994-1997``); callers here do the same by converting the
mixed background with ``linear_to_srgb`` *inside* the differentiated loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dir_to_latlong_uv(dirs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unit directions (N, 3) → (theta_norm, phi_norm) in [0,1]², with the
    reference's ``(z, -x, y)`` swizzle (``envmap.cuh:30``)."""
    dz, dnx, dy = dirs[:, 2], -dirs[:, 0], dirs[:, 1]
    # dir_to_spherical on the swizzled vector (z component = dy)
    theta = jnp.arccos(jnp.clip(dy, -1.0, 1.0)) / jnp.pi
    phi = jnp.arctan2(dnx, dz) / (2.0 * jnp.pi) + 0.5
    return theta, phi


def read_envmap(envmap: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear latlong lookup: ``envmap`` (H, W, 4) linear HDR, ``dirs``
    (N, 3) unit world directions → (N, 4)."""
    H, W, _ = envmap.shape
    theta, phi = dir_to_latlong_uv(dirs)
    fx = phi * (W - 1)
    fy = theta * (H - 1)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]

    def at(xi, yi):
        xi = jnp.where(xi < 0, xi + W, jnp.where(xi >= W, xi - W, xi))
        yi = jnp.clip(yi, 0, H - 1)
        return envmap[yi, xi]

    return (
        (1 - wx) * (1 - wy) * at(x0, y0)
        + wx * (1 - wy) * at(x0 + 1, y0)
        + (1 - wx) * wy * at(x0, y0 + 1)
        + wx * wy * at(x0 + 1, y0 + 1)
    )
