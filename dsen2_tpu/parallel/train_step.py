"""Data-parallel training step over a device mesh.

Semantics match the reference fit loop's inner step (MAE loss over the
batch, Nadam update; training/supres_train.py:137-144,218-230) but sharded:
the patch batch splits over the mesh 'data' axis, parameters are replicated
(or feature-sharded when model_parallel), and XLA inserts the gradient
all-reduce over ICI from the sharding annotations — no hand-written
collectives needed for this model family.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh

from dsen2_tpu.core.config import ModelConfig
from dsen2_tpu.models import s2net
from dsen2_tpu.parallel.mesh import batch_sharding
from dsen2_tpu.train.losses import mae, mse

__all__ = ["make_train_step", "make_eval_step"]


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    precision: str = "highest",
    remat: bool = False,
) -> Callable:
    """Returns step(params, opt_state, inputs, target) ->
    (params, opt_state, metrics) where inputs is a tuple of NHWC arrays and
    target the NHWC label, both batch-sharded when a mesh is given."""

    def loss_fn(params, inputs, target):
        pred = s2net.apply(params, inputs, cfg, precision=precision, remat=remat)
        return mae(pred, target), pred

    def step(params, opt_state, inputs, target):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, inputs, target
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "mse": mse(pred, target)}
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step)

    def place(inputs_ndim: int):
        return batch_sharding(mesh, inputs_ndim)

    # Constrain batch shardings inside the step; params/opt_state placement
    # (replicated or model-sharded) flows in from the caller's device_put.
    def step_sharded(params, opt_state, inputs, target):
        inputs = tuple(
            jax.lax.with_sharding_constraint(x, place(x.ndim)) for x in inputs
        )
        target = jax.lax.with_sharding_constraint(target, place(target.ndim))
        return step(params, opt_state, inputs, target)

    return jax.jit(step_sharded)


def make_eval_step(
    cfg: ModelConfig,
    mesh: Optional[Mesh] = None,
    precision: str = "highest",
) -> Callable:
    """Returns eval(params, inputs, target) -> {'loss','mse'} summed weights
    equal over the batch (mean)."""

    def ev(params, inputs, target):
        if mesh is not None:
            inputs = tuple(
                jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))
                for x in inputs
            )
            target = jax.lax.with_sharding_constraint(
                target, batch_sharding(mesh, target.ndim)
            )
        pred = s2net.apply(params, inputs, cfg, precision=precision)
        return {"loss": mae(pred, target), "mse": mse(pred, target)}

    return jax.jit(ev)
