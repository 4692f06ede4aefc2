"""Foveated-rendering warp — piecewise-quadratic resolution concentration.

Faithful counterpart of the reference's ``FoveationPiecewiseQuadratic`` /
``Foveation`` (``common_device.cuh:158-288``): a 1-D warp from the (small)
render buffer's [0,1] coordinate to the full image's [0,1] coordinate that
is linear (slope ``am`` = full-res pixel density) around the focus and
quadratic toward the edges. The constructor's coefficients come from the
same 20-step bisection as the reference; ``warp``/``unwarp``/``density``
are vectorized jnp so they run inside jitted ray generation.

The reference uses this for VR/DLSS; here it powers
``NerfEngine.render_view_foveated`` — render fewer rays where the viewer
isn't looking, then resample to full resolution.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PiecewiseQuadratic:
    al: float = 0.0
    bl: float = 0.0
    cl: float = 0.0
    am: float = 1.0
    bm: float = 0.0
    ar: float = 0.0
    br: float = 0.0
    cr: float = 0.0
    switch_left: float = 0.0
    switch_right: float = 1.0
    inv_switch_left: float = 0.0
    inv_switch_right: float = 1.0

    @staticmethod
    def make(center_pixel_steepness: float, center_y: float,
             center_radius: float) -> "PiecewiseQuadratic":
        """Reference constructor (``common_device.cuh:160-222``) —
        ``center_pixel_steepness`` ≥ 1 is the full-res density at the
        focus, ``center_y`` the focus position in the *full image*,
        ``center_radius`` the half-width of the full-res band."""
        am = center_pixel_steepness
        ciy = center_y
        cir = center_radius * am
        lsw = max(ciy - cir, 0.0)
        rsw = min(ciy + cir, 1.0)
        d = (rsw - lsw) / am / 2.0

        bm = 0.0
        m_min, m_max = 0.0, 1.0
        for _ in range(20):
            m = (m_min + m_max) / 2.0
            l = m - d
            r = m + d
            bm = -((am - 1.0) * l * l) / (r * r - 2.0 * r + l * l + 1.0)
            l_act = (lsw - bm) / am
            r_act = (rsw - bm) / am
            if (l_act + r_act) / 2.0 > m:
                m_min = m
            else:
                m_max = m

        l = (lsw - bm) / am
        r = (rsw - bm) / am
        if (l == 0.0 and r == 1.0) or am == 1.0:
            return PiecewiseQuadratic()
        den = r * r - 2.0 * r + l * l + 1.0
        al = (am - 1.0) / den
        bl = (am * (r * r - 2.0 * r + 1.0) + am * l * l + (2.0 - 2.0 * am) * l) / den
        bm = -((am - 1.0) * l * l) / den
        ar = -(am - 1.0) / den
        br = (am * (r * r + 1.0) - 2.0 * r + am * l * l) / den
        cr = -(am * r * r - r * r + (am - 1.0) * l * l) / den
        return PiecewiseQuadratic(
            al=al, bl=bl, cl=0.0, am=am, bm=bm, ar=ar, br=br, cr=cr,
            switch_left=l, switch_right=r,
            inv_switch_left=am * l + bm, inv_switch_right=am * r + bm,
        )

    def warp(self, x):
        x = jnp.clip(x, 0.0, 1.0)
        left = self.al * x * x + self.bl * x + self.cl
        mid = self.am * x + self.bm
        right = self.ar * x * x + self.br * x + self.cr
        return jnp.where(
            x < self.switch_left, left,
            jnp.where(x > self.switch_right, right, mid),
        )

    def unwarp(self, y):
        y = jnp.clip(y, 0.0, 1.0)
        mid = (y - self.bm) / self.am
        if self.al == 0.0 and self.ar == 0.0:
            return mid
        left = (
            jnp.sqrt(jnp.maximum(
                -4.0 * self.al * self.cl + 4.0 * self.al * y + self.bl * self.bl,
                0.0,
            )) - self.bl
        ) / (2.0 * self.al if self.al != 0.0 else 1.0)
        right = (
            jnp.sqrt(jnp.maximum(
                -4.0 * self.ar * self.cr + 4.0 * self.ar * y + self.br * self.br,
                0.0,
            )) - self.br
        ) / (2.0 * self.ar if self.ar != 0.0 else 1.0)
        return jnp.where(
            y < self.inv_switch_left, left,
            jnp.where(y > self.inv_switch_right, right, mid),
        )

    def density(self, x):
        x = jnp.clip(x, 0.0, 1.0)
        return jnp.where(
            x < self.switch_left, 2.0 * self.al * x + self.bl,
            jnp.where(
                x > self.switch_right, 2.0 * self.ar * x + self.br, self.am
            ),
        )


@dataclass(frozen=True)
class Foveation:
    """2-D foveation = independent x/y piecewise-quadratic warps
    (``Foveation``, ``common_device.cuh:268-288``)."""

    warp_x: PiecewiseQuadratic
    warp_y: PiecewiseQuadratic

    @staticmethod
    def make(steepness, center, radius) -> "Foveation":
        sx, sy = (steepness, steepness) if np.isscalar(steepness) else steepness
        cx, cy = (center, center) if np.isscalar(center) else center
        rx, ry = (radius, radius) if np.isscalar(radius) else radius
        return Foveation(
            PiecewiseQuadratic.make(sx, cx, rx),
            PiecewiseQuadratic.make(sy, cy, ry),
        )

    def warp(self, uv):
        return jnp.stack(
            [self.warp_x.warp(uv[..., 0]), self.warp_y.warp(uv[..., 1])], -1
        )

    def unwarp(self, uv):
        return jnp.stack(
            [self.warp_x.unwarp(uv[..., 0]), self.warp_y.unwarp(uv[..., 1])], -1
        )

    def density(self, uv):
        return self.warp_x.density(uv[..., 0]) * self.warp_y.density(uv[..., 1])
