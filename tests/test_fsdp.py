"""FSDP/ZeRO-style sharded-state training (parallel/nerf_fsdp.py): large
state leaves split over the mesh, GSPMD inserts the collectives; math
matches the single-chip step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _default_config, _tiny_sphere_dataset
from ngp_tpu.engines.nerf import NerfEngine
from ngp_tpu.parallel.mesh import make_mesh
from ngp_tpu.parallel.nerf_fsdp import (
    build_fsdp_train_step,
    shard_state,
    state_shardings,
)


@pytest.fixture(scope="module")
def engine():
    cfg = _default_config()
    cfg["encoding"].update({"n_levels": 4, "log2_hashmap_size": 12})
    return NerfEngine(
        _tiny_sphere_dataset(), _coerce_cfg(cfg), batch_size=8 * 256,
        min_rays_per_batch=8, grid_size=16, n_steps_per_unit=64, seed=7,
    ) if False else NerfEngine(
        cfg, _tiny_sphere_dataset(), batch_size=8 * 256,
        min_rays_per_batch=8, grid_size=16, n_steps_per_unit=64, seed=7,
    )


def test_state_shardings_split_large_leaves(engine):
    mesh = make_mesh(8)
    state = engine.init_state()
    sh = state_shardings(state, mesh, min_size=1 << 10)
    table_sh = sh.params["model"]["pos_encoding"]["table"]
    assert table_sh.spec == jax.sharding.PartitionSpec(None, "data", None)
    # tiny leaves (global focal offset) stay replicated
    assert sh.params["camera"]["focal"].spec == jax.sharding.PartitionSpec()


def test_fsdp_step_matches_single_chip(engine):
    mesh = make_mesh(8)
    state = engine.init_state()
    grid = engine.init_grid()
    key = jax.random.PRNGKey(21)

    ref_state, _, ref_metrics = engine.train_step(
        jax.tree.map(jnp.copy, state), grid, None, key
    )

    sstate = shard_state(state, mesh, min_size=1 << 10)
    step = build_fsdp_train_step(engine, mesh, min_size=1 << 10)
    new_state, metrics = step(sstate, grid, key)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    # Sharded result matches the replicated single-chip update almost
    # everywhere. GSPMD partitions the gradient sort/scan differently, so
    # float reduction order changes; first-step Adam is ±lr·sign(g) and
    # flips on near-zero gradients — bound the flip fraction instead of
    # demanding bitwise parity.
    a = np.asarray(new_state.params["model"]["pos_encoding"]["table"])
    b = np.asarray(ref_state.params["model"]["pos_encoding"]["table"])
    frac_off = np.mean(np.abs(a - b) > 1e-3)
    assert frac_off < 0.01, frac_off
    assert np.quantile(np.abs(a - b), 0.99) < 1e-4
    # and the new state is genuinely sharded
    sh = new_state.params["model"]["pos_encoding"]["table"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "data", None)
