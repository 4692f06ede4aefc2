import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.models.mlp import MLP
from ngp_tpu.ops import losses


def test_mlp_shapes():
    mlp = MLP(n_input_dims=32, n_output_dims=16, n_neurons=64, n_hidden_layers=1)
    params = mlp.init(jax.random.PRNGKey(0))
    assert len(params["weights"]) == 2
    y = mlp(params, jax.random.normal(jax.random.PRNGKey(1), (8, 32)))
    assert y.shape == (8, 16)


def test_mlp_zero_hidden_layers():
    mlp = MLP(n_input_dims=4, n_output_dims=3, n_hidden_layers=0)
    params = mlp.init(jax.random.PRNGKey(0))
    assert len(params["weights"]) == 1
    y = mlp(params, jnp.ones((2, 4)))
    assert y.shape == (2, 3)


def test_mlp_matches_numpy():
    mlp = MLP(n_input_dims=8, n_output_dims=4, n_neurons=16, n_hidden_layers=2,
              compute_dtype=jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(5, 8).astype(np.float32)
    h = x
    for w in params["weights"][:-1]:
        h = np.maximum(h @ np.asarray(w), 0)
    ref = h @ np.asarray(params["weights"][-1])
    np.testing.assert_allclose(np.asarray(mlp(params, jnp.asarray(x))), ref, rtol=1e-4)


def _check_loss_grad(fn, target, pred, expected_loss, expected_grad):
    """Check loss values and autodiff grads against the reference's closed
    forms (testbed_nerf.cu:207-284)."""
    t, p = jnp.float32(target), jnp.float32(pred)
    val = fn(t, p)
    np.testing.assert_allclose(float(val), expected_loss, rtol=1e-5)
    g = jax.grad(lambda pp: jnp.sum(fn(t, pp)))(p)
    np.testing.assert_allclose(float(g), expected_grad, rtol=1e-5)


def test_l2():
    _check_loss_grad(losses.l2, 1.0, 3.0, 4.0, 4.0)


def test_relative_l2():
    d, denom = 2.0, 9.0 + 1e-2
    _check_loss_grad(losses.relative_l2, 1.0, 3.0, d * d / denom, 2 * d / denom)


def test_l1():
    _check_loss_grad(losses.l1, 3.0, 1.0, 2.0, -1.0)


def test_huber():
    # |d| > alpha branch
    _check_loss_grad(losses.huber, 1.0, 3.0, 2.0 - 0.5, 1.0)
    # |d| <= alpha branch
    _check_loss_grad(losses.huber, 1.0, 1.5, 0.5 * 0.25, 0.5)


def test_log_l1():
    _check_loss_grad(losses.log_l1, 1.0, 3.0, np.log(3.0), 1.0 / 3.0)


def test_smape():
    denom = 0.5 * (3.0 + 1.0) + 1e-2
    _check_loss_grad(losses.smape, 1.0, 3.0, 2.0 / denom, 1.0 / denom)


def test_mape():
    denom = 3.0 + 1e-2
    _check_loss_grad(losses.mape, 1.0, 3.0, 2.0 / denom, 1.0 / denom)
