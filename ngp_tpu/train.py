"""Generic supervised trainer — the tcnn ``Trainer`` counterpart.

The reference's image/SDF/volume modes call
``m_trainer->training_step(input, target)`` + ``optimizer_step`` (e.g.
``testbed_image.cu:214-285``). Here that is one jitted pure function over a
``TrainState`` pytree: forward, per-element loss (normalized by batch size
like tcnn), grads, optax update, EMA of params for inference.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ngp_tpu.optim import EmaState, ema_init, ema_update, make_optimizer


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    ema: EmaState


def default_grid_label_fn(params):
    """Label encoding tables as 'grid' (sparse Adam) and everything else as
    'dense'. Works for both NetworkWithInputEncoding and NerfNetwork param
    trees, keyed on the 'table' leaf name used by GridEncoding."""

    def label(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return "grid" if "table" in names else "dense"

    return jax.tree_util.tree_map_with_path(label, params)


@dataclass
class Trainer:
    """Owns the model apply fn, loss, and optimizer stack; exposes a jitted
    ``training_step``. ``model_fn(params, inputs) -> predictions``."""

    model_fn: Callable
    loss_fn: Callable  # loss_fn(target, prediction) -> elementwise loss
    optimizer_cfg: dict

    def __post_init__(self):
        self.tx, self.ema_decay, self.lr_schedule = make_optimizer(
            self.optimizer_cfg, grid_label_fn=default_grid_label_fn
        )
        self._jitted_step = jax.jit(self._training_step, donate_argnums=0)

    def init(self, params) -> TrainState:
        return TrainState(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema=ema_init(params),
        )

    def loss(self, params, inputs, targets):
        pred = self.model_fn(params, inputs)
        losses = self.loss_fn(targets, pred[..., : targets.shape[-1]])
        # tcnn normalizes by the number of loss elements.
        return jnp.mean(losses)

    def training_step(self, state: TrainState, inputs, targets):
        return self._jitted_step(state, inputs, targets)

    def _training_step(self, state: TrainState, inputs, targets):
        loss, grads = jax.value_and_grad(self.loss)(state.params, inputs, targets)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, self.ema_decay, state.step)
        return (
            TrainState(state.step + 1, params, opt_state, ema),
            loss,
        )

    def inference_params(self, state: TrainState):
        """EMA-averaged params, the analogue of tcnn's inference params."""
        return state.ema.params if self.ema_decay is not None else state.params
