"""Axis-aligned bounding box math (functional, batched).

Counterpart of the reference's ``bounding_box.cuh``: boxes are ``(min, max)``
float32 (3,) arrays; every op is vectorized over leading ray/point axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class AABB(NamedTuple):
    min: jnp.ndarray  # (3,)
    max: jnp.ndarray  # (3,)

    @staticmethod
    def unit() -> "AABB":
        return AABB(jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32))

    @staticmethod
    def from_scale(aabb_scale: float) -> "AABB":
        """The reference's NeRF AABB: unit cube inflated symmetrically around
        0.5 by ``aabb_scale`` (``load_nerf_post``, power of 2 ≤ 128)."""
        c = 0.5
        h = 0.5 * aabb_scale
        return AABB(
            jnp.full(3, c - h, jnp.float32), jnp.full(3, c + h, jnp.float32)
        )

    def diag(self):
        return self.max - self.min

    def center(self):
        return 0.5 * (self.max + self.min)

    def relative_pos(self, pos):
        """Warp a scene position into [0,1]³ — the reference's
        ``warp_position`` (``testbed_nerf.cu:389``)."""
        return (pos - self.min) / self.diag()

    def unwarp(self, pos01):
        return self.min + pos01 * self.diag()

    def contains(self, pos):
        return jnp.all((pos >= self.min) & (pos <= self.max), axis=-1)

    def ray_intersect(self, origin, direction):
        """Slab test; returns (tmin, tmax) per ray. Misses have tmin > tmax.
        Matches ``BoundingBox::ray_intersect`` semantics."""
        inv_d = 1.0 / direction
        t0 = (self.min - origin) * inv_d
        t1 = (self.max - origin) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tmin = jnp.maximum(tmin, 0.0)
        return tmin, tmax

    def signed_distance(self, pos):
        q = jnp.abs(pos - self.center()) - 0.5 * self.diag()
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside

    def enlarged(self, pos):
        return AABB(jnp.minimum(self.min, pos), jnp.maximum(self.max, pos))

    def intersection(self, other: "AABB") -> "AABB":
        return AABB(jnp.maximum(self.min, other.min), jnp.minimum(self.max, other.max))
