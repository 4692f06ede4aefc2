import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.config import load_config, loads_jsonc
from ngp_tpu.models.factory import (
    create_encoding,
    create_loss,
    create_nerf_network,
    create_network_with_input_encoding,
)
from ngp_tpu.optim import (
    ema_init,
    ema_update,
    exponential_decay_schedule,
    make_optimizer,
    scale_by_adam_skip_zero,
)
from ngp_tpu.train import Trainer

REF_CONFIGS = "/root/reference/configs"


def test_load_reference_configs():
    import glob

    for path in glob.glob(f"{REF_CONFIGS}/*/*.json"):
        cfg = load_config(path)
        assert "encoding" in cfg or "otype" in cfg.get("network", {}) or True


def test_jsonc_comments():
    cfg = loads_jsonc('{\n // comment\n "a": 1\n}')
    assert cfg == {"a": 1}


def test_build_nerf_network_from_reference_config():
    cfg = load_config(f"{REF_CONFIGS}/nerf/base.json")
    net = create_nerf_network(cfg)
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))
    out = net(params, pos, dirs)
    assert out.shape == (32, 4)
    sigma_feat = net.density(params, pos)
    assert sigma_feat.shape == (32, 16)


def test_build_image_network_from_reference_config():
    cfg = load_config(f"{REF_CONFIGS}/image/base.json")
    model = create_network_with_input_encoding(2, 3, cfg)
    params = model.init(jax.random.PRNGKey(0))
    y = model(params, jax.random.uniform(jax.random.PRNGKey(1), (16, 2)))
    assert y.shape == (16, 3)


def test_exponential_decay_schedule():
    sched = exponential_decay_schedule(
        {"decay_start": 100, "decay_interval": 10, "decay_base": 0.5}, 1.0
    )
    np.testing.assert_allclose(float(sched(0)), 1.0)
    np.testing.assert_allclose(float(sched(100)), 1.0)
    np.testing.assert_allclose(float(sched(110)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(120)), 0.25, rtol=1e-6)


def test_adam_skip_zero_leaves_untouched_entries():
    tx = scale_by_adam_skip_zero()
    params = {"t": jnp.zeros((4,))}
    state = tx.init(params)
    g = {"t": jnp.asarray([1.0, 0.0, -2.0, 0.0])}
    updates, state = tx.update(g, state, params)
    u = np.asarray(updates["t"])
    assert u[1] == 0 and u[3] == 0
    assert u[0] != 0 and u[2] != 0
    # second step with different sparsity
    g2 = {"t": jnp.asarray([0.0, 1.0, 0.0, 0.0])}
    updates2, state = tx.update(g2, state, params)
    u2 = np.asarray(updates2["t"])
    assert u2[0] == 0 and u2[1] != 0


def test_ema_update():
    ema = ema_init({"w": jnp.zeros(2)})
    ema = ema_update(ema, {"w": jnp.ones(2)}, 0.95, jnp.int32(1000))
    assert 0.04 < float(ema.params["w"][0]) < 0.06


def test_trainer_fits_toy_regression():
    """End-to-end sanity: hashgrid+MLP should overfit a smooth 2D function."""
    cfg = load_config(f"{REF_CONFIGS}/image/base.json")
    cfg["encoding"]["log2_hashmap_size"] = 14
    cfg["encoding"]["n_levels"] = 8
    model = create_network_with_input_encoding(2, 1, cfg)
    trainer = Trainer(
        model_fn=model.__call__,
        loss_fn=create_loss(cfg["loss"]),
        optimizer_cfg=cfg["optimizer"],
    )
    # image config lr is 1e-2
    params = model.init(jax.random.PRNGKey(0))
    state = trainer.init(params)

    def target_fn(x):
        return jnp.sin(x[:, :1] * 6) * jnp.cos(x[:, 1:2] * 4)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(200):
        key, sub = jax.random.split(key)
        x = jax.random.uniform(sub, (1024, 2))
        state, loss = trainer.training_step(state, x, target_fn(x))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.05, losses[::50]
