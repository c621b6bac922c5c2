"""Training losses/metrics: MAE loss + MSE metric, matching the reference
compile (training/supres_train.py:144: loss='mean_absolute_error',
metrics=['mean_squared_error'])."""

from __future__ import annotations

import jax.numpy as jnp


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))
