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
