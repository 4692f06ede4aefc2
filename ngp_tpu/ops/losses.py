"""Per-element loss library.

Semantics match the reference's per-ray RGB loss family
(``testbed_nerf.cu:207-284``, dispatch ``1340-1380``) and tcnn's supervised
losses. Each loss returns elementwise values; JAX autodiff reproduces the
reference's hand-written gradients (verified in tests against the closed
forms above).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2(target, prediction):
    d = prediction - target
    return d * d


def relative_l2(target, prediction):
    d = prediction - target
    denom = jax.lax.stop_gradient(prediction * prediction) + 1e-2
    return d * d / denom


def l1(target, prediction):
    return jnp.abs(prediction - target)


def huber(target, prediction, alpha: float = 1.0):
    d = prediction - target
    ad = jnp.abs(d)
    return jnp.where(ad > alpha, ad - 0.5 * alpha, 0.5 / alpha * d * d)


def log_l1(target, prediction):
    return jnp.log(jnp.abs(prediction - target) + 1.0)


def smape(target, prediction):
    d = prediction - target
    denom = jax.lax.stop_gradient(
        0.5 * (jnp.abs(prediction) + jnp.abs(target))
    ) + 1e-2
    return jnp.abs(d) / denom


def mape(target, prediction):
    d = prediction - target
    denom = jax.lax.stop_gradient(jnp.abs(prediction)) + 1e-2
    return jnp.abs(d) / denom


_LOSSES = {
    "l2": l2,
    "relativel2": relative_l2,
    "l1": l1,
    "huber": huber,
    "logl1": log_l1,
    "smape": smape,
    "mape": mape,
}


def get_loss(otype: str):
    key = otype.lower().replace("_", "")
    if key not in _LOSSES:
        raise ValueError(f"unknown loss {otype!r}")
    return _LOSSES[key]
