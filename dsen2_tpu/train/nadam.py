"""Keras-2 Nadam with schedule_decay, as an optax GradientTransformation.

The reference trains with keras.optimizers.Nadam(lr=1e-4, beta_1=0.9,
beta_2=0.999, epsilon=1e-8, schedule_decay=0.004)
(training/supres_train.py:137-141). optax's nadam is the Dozat/"timm"
variant WITHOUT the 0.96^t momentum warm-up schedule, so resuming a
reference run would drift; this implements the exact Keras-2 update:

    t                = step + 1
    mu_t             = beta1 * (1 - 0.5 * 0.96^(t * sd))
    mu_{t+1}         = beta1 * (1 - 0.5 * 0.96^((t+1) * sd))
    M_t              = M_{t-1} * mu_t                (momentum-schedule product)
    g'               = g / (1 - M_t)
    m_t              = beta1 * m + (1-beta1) * g
    m'               = m_t / (1 - M_t * mu_{t+1})
    v_t              = beta2 * v + (1-beta2) * g^2
    v'               = v_t / (1 - beta2^t)
    update           = -lr * ((1-mu_t) * g' + mu_{t+1} * m') / (sqrt(v') + eps)
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["nadam_keras", "NadamKerasState"]


class NadamKerasState(NamedTuple):
    count: chex.Array  # int32 scalar, completed steps
    m_schedule: chex.Array  # f32 scalar, prod of mu_1..mu_t
    mu: optax.Updates  # first moment
    nu: optax.Updates  # second moment


def nadam_keras(
    learning_rate: optax.ScalarOrSchedule = 1e-4,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    schedule_decay: float = 0.004,
) -> optax.GradientTransformation:
    def init_fn(params):
        return NadamKerasState(
            count=jnp.zeros([], jnp.int32),
            m_schedule=jnp.ones([], jnp.float32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu_t = beta1 * (1.0 - 0.5 * jnp.power(0.96, tf * schedule_decay))
        mu_t1 = beta1 * (1.0 - 0.5 * jnp.power(0.96, (tf + 1.0) * schedule_decay))
        m_sched_t = state.m_schedule * mu_t
        m_sched_t1 = m_sched_t * mu_t1

        mu = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1.0 - beta1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1.0 - beta2) * jnp.square(g), state.nu, updates
        )

        beta2_t = jnp.power(jnp.asarray(beta2, jnp.float32), tf)
        if callable(learning_rate):
            lr = learning_rate(state.count)
        else:
            lr = learning_rate

        def upd(g, m, v):
            g_prime = g / (1.0 - m_sched_t)
            m_prime = m / (1.0 - m_sched_t1)
            v_prime = v / (1.0 - beta2_t)
            m_bar = (1.0 - mu_t) * g_prime + mu_t1 * m_prime
            return -lr * m_bar / (jnp.sqrt(v_prime) + eps)

        new_updates = jax.tree_util.tree_map(upd, updates, mu, nu)
        return new_updates, NadamKerasState(t, m_sched_t, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)
