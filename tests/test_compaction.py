"""Compaction round-trip and gradient correctness (ops/compaction.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops.compaction import compact_rows, compaction_plan, expand_rows


@pytest.mark.parametrize("budget", [8, 16, 64])
def test_round_trip(budget):
    key = jax.random.PRNGKey(0)
    nk = 64
    valid = jax.random.bernoulli(key, 0.4, (nk,))
    x = jax.random.normal(jax.random.fold_in(key, 1), (nk, 3))
    plan = compaction_plan(valid, budget)
    xc = compact_rows(x, plan)
    back = expand_rows(xc, plan)
    nv = int(jnp.sum(valid))
    kept = min(nv, budget)
    # valid slots (within budget) round-trip exactly; others are zero
    vs = np.where(np.asarray(valid))[0]
    np.testing.assert_allclose(np.asarray(back)[vs[:kept]], np.asarray(x)[vs[:kept]])
    dropped = np.ones(nk, bool)
    dropped[vs[:kept]] = False
    assert np.all(np.asarray(back)[dropped] == 0.0)
    # compact rows are in stable slot order
    assert np.all(np.diff(np.asarray(plan.cidx[:kept])) > 0)


def test_grads_match_dense_computation():
    """f(x) = sum(g(compact(x)) expanded) must have the same gradient as the
    dense masked computation for any elementwise g."""
    key = jax.random.PRNGKey(2)
    nk, budget = 128, 64
    valid = jax.random.bernoulli(key, 0.35, (nk,))
    x = jax.random.normal(jax.random.fold_in(key, 1), (nk, 4))
    w = jax.random.normal(jax.random.fold_in(key, 2), (4, 2))

    def f_compact(x):
        plan = compaction_plan(valid, budget)
        y = jnp.tanh(compact_rows(x, plan) @ w)
        return jnp.sum(expand_rows(y, plan) ** 2)

    def f_dense(x):
        y = jnp.tanh(x @ w)
        y = jnp.where(valid[:, None], y, 0.0)
        return jnp.sum(y ** 2)

    g_c = jax.grad(f_compact)(x)
    g_d = jax.grad(f_dense)(x)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d), rtol=1e-5, atol=1e-6)


def test_budget_overflow_drops_tail_gradients():
    nk, budget = 32, 4
    valid = jnp.ones((nk,), bool)
    x = jnp.ones((nk, 1))

    def f(x):
        plan = compaction_plan(valid, budget)
        return jnp.sum(expand_rows(compact_rows(x, plan) * 2.0, plan))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g[:budget, 0]), 2.0)
    np.testing.assert_allclose(np.asarray(g[budget:, 0]), 0.0)
