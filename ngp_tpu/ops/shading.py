"""SDF render shading: the reference's Disney-style BRDF and soft-shadow
math, vectorized over rays.

``evaluate_shading`` reproduces ``src/testbed_sdf.cu:78-148`` (itself based
on Burley's published Disney BRDF course notes) term by term: Schlick
fresnel diffuse with retro-reflection, Hanrahan-Krueger subsurface
approximation, GGX specular with Smith masking, sheen, and a clearcoat
lobe. The soft-shadow visibility update is Quilez's improved sphere-traced
shadow estimate used by ``advance_pos_kernel_sdf``
(``src/testbed_sdf.cu:196-206``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

PI = 3.14159265358979


@dataclass(frozen=True)
class BRDFParams:
    """Defaults from ``include/neural-graphics-primitives/sdf.h:62-73``."""

    metallic: float = 0.0
    subsurface: float = 0.0
    specular: float = 1.0
    roughness: float = 0.5
    sheen: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 0.0
    basecolor: tuple = (0.8, 0.8, 0.8)
    ambientcolor: tuple = (0.0, 0.0, 0.0)


def _schlick_fresnel(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return m ** 5


def _g1(ndoth, a):
    # testbed_sdf.cu:56-61 (clearcoat distribution)
    a = jnp.asarray(a)
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return jnp.where(
        a >= 1.0, 1.0 / PI, (a2 - 1.0) / (PI * jnp.log(a2) * t)
    )


def _g2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (PI * t * t)


def _smith_g_ggx(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / (ndotv + jnp.sqrt(a + b - a * b))


def _mix(a, b, t):
    return a + (b - a) * t


def evaluate_shading(
    base_color,  # (N, 3)
    ambient_color,  # (N, 3) or (3,)
    light_color,  # (N, 3) — sun color x shadow factor
    L,  # (3,) unit light dir
    V,  # (N, 3) unit view dir (towards camera)
    N,  # (N, 3) unit normal
    brdf: BRDFParams = BRDFParams(),
):
    """Disney-ish BRDF (``evaluate_shading``, testbed_sdf.cu:78-148).
    ``specular_tint`` and ``sheen_tint`` are 0 in the reference's call site
    (``shade_kernel_sdf``, :354-356) and are folded in as such."""
    L = jnp.broadcast_to(jnp.asarray(L), N.shape)
    ndotl = jnp.sum(N * L, axis=-1)
    ndotv = jnp.sum(N * V, axis=-1)

    H = L + V
    H = H / jnp.maximum(jnp.linalg.norm(H, axis=-1, keepdims=True), 1e-9)
    ndoth = jnp.sum(N * H, axis=-1)
    ldoth = jnp.sum(L * H, axis=-1)

    FL = _schlick_fresnel(ndotl)
    FV = _schlick_fresnel(ndotv)
    amb = (
        jnp.broadcast_to(jnp.asarray(ambient_color), base_color.shape)
        * _mix(0.2, FV, brdf.metallic)[..., None]
        * base_color
    )

    lum = jnp.sum(base_color * jnp.asarray([0.3, 0.6, 0.1]), axis=-1)
    ctint = base_color / (lum[..., None] + 1e-5)
    # specular_tint = 0 → the white lobe; kept explicit for parity reading
    cspec0 = _mix(
        jnp.ones_like(base_color) * brdf.specular * 0.08,
        base_color,
        brdf.metallic,
    )
    csheen = jnp.ones_like(ctint)  # sheen_tint = 0

    fd90 = 0.5 + 2.0 * ldoth * ldoth * brdf.roughness
    fd = _mix(1.0, fd90, FL) * _mix(1.0, fd90, FV)

    fss90 = ldoth * ldoth * brdf.roughness
    fss = _mix(1.0, fss90, FL) * _mix(1.0, fss90, FV)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(ndotl + ndotv, 1e-6) - 0.5) + 0.5)

    a = max(0.001, brdf.roughness ** 2)
    ds = _g2(ndoth, a)
    FH = _schlick_fresnel(ldoth)
    fs = _mix(cspec0, jnp.ones_like(cspec0), FH[..., None])
    gs = _smith_g_ggx(ndotl, a) * _smith_g_ggx(ndotv, a)

    fsheen = FH[..., None] * brdf.sheen * csheen

    dr = _g1(ndoth, _mix(0.1, 0.001, brdf.clearcoat_gloss))
    fr = _mix(0.04, 1.0, FH)
    gr = _smith_g_ggx(ndotl, 0.25) * _smith_g_ggx(ndotv, 0.25)
    ccs = 0.25 * brdf.clearcoat * gr * fr * dr

    diffuse = _mix(fd, ss, brdf.subsurface)[..., None] * base_color / PI
    brdf_val = (
        (diffuse + fsheen) * (1.0 - brdf.metallic)
        + (gs * ds)[..., None] * fs
        + ccs[..., None]
    )
    lit = brdf_val * jnp.asarray(light_color) * ndotl[..., None] + amb
    backface = (ndotl < 0.0) | (ndotv < 0.0)
    return jnp.where(backface[..., None], amb, lit)


def soft_shadow_visibility_update(
    min_vis, prev_distance, total_distance, distance, k
):
    """One sphere-trace step of Quilez's improved soft shadow
    (``advance_pos_kernel_sdf``, testbed_sdf.cu:196-206): estimate the
    closest-approach distance of the occluder from two consecutive sphere
    radii and keep the minimum penumbra ratio. Returns
    (min_vis', prev_distance', total_distance')."""
    y = distance * distance / (2.0 * jnp.maximum(prev_distance, 1e-20))
    d = jnp.sqrt(jnp.maximum(distance * distance - y * y, 0.0))
    vis = k * d / jnp.maximum(total_distance - y, 1e-20)
    upd = distance > 0.0
    min_vis = jnp.where(upd, jnp.minimum(min_vis, vis), min_vis)
    prev_distance = jnp.where(upd, distance, prev_distance)
    total_distance = jnp.where(upd, total_distance + distance, total_distance)
    return min_vis, prev_distance, total_distance
