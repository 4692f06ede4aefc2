"""FSDP/ZeRO-style sharded-state training — the pjit/GSPMD path.

``nerf_dp.py`` is explicit SPMD (shard_map): params replicated, rays
sharded, gradients pmean-ed. This module is the compiler-driven
alternative for when the *state* itself should shard: every large
parameter/optimizer/EMA leaf is stored split along its leading axis
across the mesh (ZeRO-3 semantics), and XLA's GSPMD partitioner inserts
the all-gathers (params, before use) and reduce-scatters (gradients)
automatically — the "annotate shardings, let XLA insert collectives"
recipe. For instant-ngp's hash tables this matters at big ``T`` or many
levels: a (L, 2^19, F) fp32 table plus Adam's two moments plus the EMA
copy is 4× table bytes; sharding 8-ways cuts per-chip state 8×.

The step function is the *single-chip* training step unchanged — no
collectives in user code. The reference has no counterpart at all (its
training is single-GPU, SURVEY §2.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ngp_tpu.engines.nerf import NerfEngine
from ngp_tpu.parallel.mesh import DATA_AXIS


def _leaf_spec(leaf, n_dev: int, min_size: int) -> P:
    """Shard the largest axis divisible by the mesh (hash tables are
    (L, T, F) with a small level axis — the row axis is the one to
    split); replicate when nothing divides or the leaf is small."""
    if not hasattr(leaf, "shape") or leaf.ndim < 1 or leaf.size < min_size:
        return P()
    candidates = [a for a in range(leaf.ndim) if leaf.shape[a] % n_dev == 0]
    if not candidates:
        return P()
    axis = max(candidates, key=lambda a: leaf.shape[a])
    spec = [None] * leaf.ndim
    spec[axis] = DATA_AXIS
    return P(*spec)


def state_shardings(state, mesh: Mesh, min_size: int = 1 << 14):
    """NamedShardings for a TrainState: large leaves split on their
    leading axis (hash tables shard over levels/rows, Adam moments and
    the EMA follow their parameters), small leaves replicated."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n_dev, min_size)),
        state,
    )


def shard_state(state, mesh: Mesh, min_size: int = 1 << 14):
    """Place an existing (host/replicated) TrainState into its sharded
    layout."""
    sh = state_shardings(state, mesh, min_size)
    return jax.tree.map(jax.device_put, state, sh)


def build_fsdp_train_step(engine: NerfEngine, mesh: Mesh,
                          min_size: int = 1 << 14):
    """Returns ``step(state, grid, key) -> (state, emap?, metrics)`` where
    ``state`` lives sharded per :func:`state_shardings`. The body is the
    engine's plain single-chip ``_train_step``; GSPMD partitions it."""
    from functools import partial

    cache: dict[int, object] = {}

    def step(state, grid, key):
        k = engine._k
        fn = cache.get(k)
        if fn is None:
            sh = state_shardings(state, mesh, min_size)
            repl = NamedSharding(mesh, P())
            fn = jax.jit(
                partial(engine._train_step, k=k),
                in_shardings=(sh, repl, repl, repl, None, None),
                out_shardings=(sh, None, None),
                donate_argnums=(0,),
            )
            cache[k] = fn
        new_state, emap, metrics = fn(
            state, grid.bitfield, grid.mean_density, key, engine.data, None
        )
        return new_state, metrics

    return step
