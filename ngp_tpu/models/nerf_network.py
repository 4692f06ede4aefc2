"""NeRF network composition: hash-grid density net + SH-conditioned rgb net.

Mirrors the reference's ``NerfNetwork`` (``include/.../nerf_network.h:116-428``):

  density_feat = density_mlp(pos_encoding(x))            # 16-wide output
  rgb          = rgb_mlp(concat(density_feat, dir_encoding(d, extra)))
  raw density  = density_feat[..., 0]

Activations (exp/logistic/relu with the reference's clamps,
``testbed_nerf.cu:317-388``) are applied by the engines, not here — exactly
like the reference, where the network emits raw values and the compositing
kernels activate them.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ngp_tpu.models.encodings import Encoding
from ngp_tpu.models.mlp import MLP


@dataclass(frozen=True)
class NerfNetwork:
    pos_encoding: Encoding
    dir_encoding: Encoding
    density_mlp: MLP
    rgb_mlp: MLP

    def init(self, key: jax.Array):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "pos_encoding": self.pos_encoding.init(k1),
            "dir_encoding": self.dir_encoding.init(k2),
            "density_mlp": self.density_mlp.init(k3),
            "rgb_mlp": self.rgb_mlp.init(k4),
        }

    @property
    def n_params(self) -> int:
        return (
            self.pos_encoding.n_params
            + self.dir_encoding.n_params
            + self.density_mlp.n_params
            + self.rgb_mlp.n_params
        )

    def density(
        self,
        params,
        pos: jax.Array,
        max_level: int | None = None,
        differentiable_inputs: bool = False,
    ) -> jax.Array:
        """Raw density-network output (N, 16); channel 0 is raw log-density.

        Counterpart of ``NerfNetwork::density`` used for occupancy-grid
        updates (``testbed_nerf.cu:3500-3516``). Pass
        ``differentiable_inputs=True`` where d(out)/d(pos) must flow (camera
        refinement, analytic normals) — the grid encoding's fast custom VJP
        does not propagate input gradients."""
        kwargs = {}
        if max_level is not None:
            kwargs["max_level"] = max_level
        from ngp_tpu.models.encodings import GridEncoding

        if differentiable_inputs and isinstance(self.pos_encoding, GridEncoding):
            kwargs["differentiable_inputs"] = True
        enc = self.pos_encoding(params["pos_encoding"], pos, **kwargs)
        return self.density_mlp(params["density_mlp"], enc)

    def __call__(
        self,
        params,
        pos: jax.Array,
        dirs: jax.Array,
        extra: jax.Array | None = None,
        max_level: int | None = None,
        differentiable_inputs: bool = False,
    ) -> jax.Array:
        """Full forward: (N,3) warped pos + (N,3) warped dir (+ extras) →
        (N, 4) raw [r, g, b, sigma]."""
        feat = self.density(
            params, pos, max_level=max_level,
            differentiable_inputs=differentiable_inputs,
        )
        dir_in = dirs if extra is None else jnp.concatenate([dirs, extra], axis=-1)
        dir_enc = self.dir_encoding(params["dir_encoding"], dir_in)
        rgb_in = jnp.concatenate([feat, dir_enc], axis=-1)
        rgb = self.rgb_mlp(params["rgb_mlp"], rgb_in)
        return jnp.concatenate([rgb[:, :3], feat[:, :1]], axis=-1)
