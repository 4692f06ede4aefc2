"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
``xla_force_host_platform_device_count=8``): data-parallel NeRF training,
sharded occupancy updates, sharded rendering, and the driver entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.parallel.mesh import make_mesh
from ngp_tpu.parallel.nerf_dp import (
    build_dp_grid_update,
    build_dp_render,
    build_dp_train_step,
    dp_train,
)


@pytest.fixture(scope="module")
def engine():
    from test_nerf_engine import CONFIG, _make_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    return NerfEngine(
        dict(CONFIG),
        _make_dataset(),
        batch_size=1 << 13,
        n_render_samples=64,
        grid_size=16,
        n_steps_per_unit=128,
        density_grid_decay=0.8,
        seed=11,
    )


def test_mesh_creation():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8
    with pytest.raises(ValueError):
        make_mesh(64)


def test_dp_step_matches_replicated_semantics(engine):
    """One DP step must produce identical params on every device and a
    finite loss; grads are pmean-ed so the update is a pure function of
    the global batch."""
    mesh = make_mesh(8)
    state = engine.init_state()
    grid = engine.init_grid()
    step = build_dp_train_step(engine, mesh)
    new_state, metrics = step(state, grid, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params replicated: fully addressable and identical across devices
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_step_equivalent_to_single_chip_math(engine):
    """The DP step's math must equal the single-chip step on the same
    global batch: each shard i draws rays with fold_in(key, i), grads are
    pmean-ed, and the replicated optimizer applies them. Recompute that by
    hand with the engine's own (non-shard_map) loss_and_grads and assert
    the resulting params match. Guards against param-tree plumbing bugs
    that finiteness checks cannot see (round-1 regression)."""
    mesh = make_mesh(8)
    state = engine.init_state()
    grid = engine.init_grid()
    key = jax.random.PRNGKey(42)

    step = build_dp_train_step(engine, mesh, return_grads=True)
    dp_state, dp_metrics = step(state, grid, key)
    assert int(dp_state.step) == 1

    k = engine._k
    n_rays_local = max(engine.batch_size // k // 8, 1)
    state2 = engine.init_state()
    grads_sum = None
    for i in range(8):
        ki = jax.random.fold_in(key, i)
        _, _, g = engine.batch_loss_and_grads(
            state2.params, grid.bitfield, grid.mean_density, ki,
            engine.data, k, n_rays_local,
        )
        grads_sum = g if grads_sum is None else jax.tree.map(jnp.add, grads_sum, g)
    grads_mean = jax.tree.map(lambda x: x / 8.0, grads_sum)

    flat_dp, tree_dp = jax.tree.flatten(dp_metrics["grads"])
    flat_ref, tree_ref = jax.tree.flatten(grads_mean)
    assert tree_dp == tree_ref
    for a, b in zip(flat_dp, flat_ref):
        # identical math up to summation order => tight atol, loose rtol on
        # denormal-scale entries
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_dp_grid_update_equivalent_densities(engine):
    """Warmup (all-cells) DP grid update must agree with the single-chip
    update on which cells are occupied: both query the same density MLP at
    jittered cell positions, so the bitfields should broadly match (jitter
    differs — compare mean density, a jitter-robust statistic)."""
    mesh = make_mesh(8)
    state = engine.init_state()
    update = build_dp_grid_update(engine, mesh)
    g_dp = update(state, engine.init_grid(), jax.random.PRNGKey(5), warmup=True)
    g_sc = engine.update_grid(state, engine.init_grid(), jax.random.PRNGKey(5), warmup=True)
    assert np.isfinite(float(g_dp.mean_density))
    np.testing.assert_allclose(
        float(g_dp.mean_density), float(g_sc.mean_density), rtol=0.05, atol=1e-4
    )


def test_dp_grid_update(engine):
    mesh = make_mesh(8)
    state = engine.init_state()
    grid = engine.init_grid()
    update = build_dp_grid_update(engine, mesh)
    g1 = update(state, grid, jax.random.PRNGKey(1), warmup=True)
    assert int(g1.ema_step) == 1
    g2 = update(state, g1, jax.random.PRNGKey(2), warmup=False)
    assert int(g2.ema_step) == 2
    assert np.isfinite(float(g2.mean_density))


@pytest.mark.slow
def test_dp_training_converges_and_renders(engine):
    mesh = make_mesh(8)
    state = engine.init_state()
    grid = engine.init_grid()
    state, grid, metrics = dp_train(engine, mesh, state, grid, 150)
    first_loss = None
    assert float(metrics["loss"]) < 0.01

    render = build_dp_render(engine, mesh)
    o = jnp.tile(jnp.asarray([[1.6, 0.5, 0.5]]), (256, 1))
    d = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (256, 1))
    rgb, depth, opa = render(engine.inference_params(state), grid.bitfield, o, d)
    # the ray from +x towards the center hits the sphere
    assert float(opa[0]) > 0.8
    assert float(rgb[0, 0]) > float(rgb[0, 2])  # red-ish


def test_graft_entry_points():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1 << 16, 4)
    g.dryrun_multichip(8)
