"""Color-space conversions and tonemapping curves.

sRGB math matches the reference (``common_device.cuh:75-122``); tonemap
operators (ACES/Hable/Reinhard) match ``src/render_buffer.cu``'s
``tonemap`` used in ``render_frame_epilogue``.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(x):
    x = jnp.asarray(x)
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = jnp.asarray(x)
    return jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * jnp.maximum(x, 1e-9) ** (1.0 / 2.4) - 0.055
    )


def tonemap_reinhard(x):
    return x / (x + 1.0)


def tonemap_aces(x):
    # Narkowicz's ACES fit, as used by the reference's render buffer.
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap_hable(x):
    def f(v):
        A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        return ((v * (A * v + C * B) + D * E) / (v * (A * v + B) + D * F)) - E / F

    W = 11.2
    return f(x) / f(jnp.asarray(W))


TONEMAPS = {
    "identity": lambda x: x,
    "reinhard": tonemap_reinhard,
    "aces": tonemap_aces,
    "hable": tonemap_hable,
}


def luminance(rgb):
    return (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    )
