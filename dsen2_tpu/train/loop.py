"""The training driver: Keras-fit-equivalent epoch loop, TPU-sharded.

Capability match for training/supres_train.py's __main__ (:109-230): Nadam +
MAE/MSE, per-epoch shuffling, validation split, best-val checkpointing,
plateau LR, text/PNG logging, resume — with the batch sharded over the
device mesh and the LR injected as optimizer state so plateau reductions
never retrace."""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dsen2_tpu.core.config import ModelConfig, TrainConfig
from dsen2_tpu.models import s2net
from dsen2_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from dsen2_tpu.train.callbacks import BestCheckpoint, LossLogger, ReduceLROnPlateau
from dsen2_tpu.train.nadam import nadam_keras

__all__ = ["TrainState", "fit"]


@dataclasses.dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    epoch: int = 0


def _batches(n: int, batch_size: int, rng: np.random.Generator, shuffle: bool):
    idx = rng.permutation(n) if shuffle else np.arange(n)
    # Keras fit drops no samples; the final short batch runs at its own size
    # (retraces once for the remainder shape, then it's cached).
    for i in range(0, n, batch_size):
        yield idx[i : i + batch_size]


def fit(
    cfg: ModelConfig,
    train_cfg: TrainConfig,
    train_inputs: Sequence[np.ndarray],  # tuple of [N,H,W,C] f32, already /SCALE
    train_labels: np.ndarray,  # [N,H,W,C_out]
    val_inputs: Sequence[np.ndarray],
    val_labels: np.ndarray,
    params: Optional[Dict] = None,
    mesh=None,
    epochs: Optional[int] = None,
    precision: str = "high",
    remat: bool = False,
    verbose: bool = True,
    stage_data: bool = False,
) -> Tuple[TrainState, Dict[str, list]]:
    """Train; returns (final state, history). Checkpoints/logs go to
    train_cfg.out_dir when set (filename convention
    {model_nr}lr_{lr:.0e}.hdf5 like training/supres_train.py:195)."""
    if params is None:
        params = s2net.init_params(jax.random.PRNGKey(train_cfg.seed), cfg)
    if mesh is None and jax.device_count() > 1:
        mesh = make_mesh()

    # LR lives in optimizer state via inject_hyperparams -> plateau updates
    # are a state mutation, not a retrace.
    opt = optax.inject_hyperparams(nadam_keras)(
        learning_rate=train_cfg.lr,
        beta1=train_cfg.beta1,
        beta2=train_cfg.beta2,
        eps=train_cfg.eps,
        schedule_decay=train_cfg.schedule_decay,
    )
    opt_state = opt.init(params)

    if mesh is not None:
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)

    if stage_data and mesh is None:
        # Device-resident dataset: per-batch indexing becomes an on-device
        # gather instead of a host->device transfer every step (the
        # all-in-RAM design of the reference, moved to HBM;
        # training/README.md:18).
        train_inputs = tuple(jnp.asarray(a) for a in train_inputs)
        train_labels = jnp.asarray(train_labels)
        val_inputs = tuple(jnp.asarray(a) for a in val_inputs)
        val_labels = jnp.asarray(val_labels)

    def place_batch(arrs):
        if mesh is None:
            return tuple(jnp.asarray(a) for a in arrs)
        ndev = mesh.devices.size
        out = []
        for a in arrs:
            if a.shape[0] % ndev == 0:
                out.append(jax.device_put(jnp.asarray(a), batch_sharding(mesh, a.ndim)))
            else:
                # Final short batch (Keras drops no samples): replicate it
                # instead of sharding — one extra trace, exact semantics.
                out.append(jax.device_put(jnp.asarray(a), replicated(mesh)))
        return tuple(out)

    from dsen2_tpu.train.losses import mae, mse

    def loss_fn(p, inputs, target):
        pred = s2net.apply(p, inputs, cfg, precision=precision, remat=remat)
        return mae(pred, target), mse(pred, target)

    @jax.jit
    def train_step(p, st, inputs, target):
        (loss, mse_), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, inputs, target)
        updates, st = opt.update(grads, st, p)
        p = optax.apply_updates(p, updates)
        return p, st, loss, mse_

    @jax.jit
    def eval_step(p, inputs, target):
        return loss_fn(p, inputs, target)

    plateau = ReduceLROnPlateau(
        lr=train_cfg.lr,
        factor=train_cfg.plateau_factor,
        patience=train_cfg.plateau_patience,
        min_delta=train_cfg.plateau_min_delta,
        cooldown=train_cfg.plateau_cooldown,
        min_lr=train_cfg.plateau_min_lr,
        verbose=verbose,
    )
    logger = ckpt = None
    if train_cfg.out_dir:
        os.makedirs(train_cfg.out_dir, exist_ok=True)
        logger = LossLogger(train_cfg.out_dir, train_cfg.model_nr, train_cfg.lr)
        ckpt = BestCheckpoint(
            os.path.join(
                train_cfg.out_dir, f"{train_cfg.model_nr}lr_{train_cfg.lr:.0e}"
            ),
            verbose=verbose,
        )

    n = train_labels.shape[0]
    rng = np.random.default_rng(train_cfg.seed)
    history: Dict[str, list] = {"loss": [], "val_loss": [], "mse": [], "lr": []}
    epochs = train_cfg.epochs if epochs is None else epochs

    # `live` is updated by the epoch loop after every completed epoch so the
    # interrupt handler saves the CURRENT state, not fit's initial bindings.
    live = {"params": params, "opt_state": opt_state}
    try:
        _epoch_loop(
            train_cfg, train_inputs, train_labels, val_inputs, val_labels,
            live, train_step, eval_step, plateau, logger, ckpt,
            n, rng, history, epochs, verbose, place_batch,
        )
    except KeyboardInterrupt:
        # Failure handling the reference lacks (SURVEY.md §5.3): an
        # interrupted run leaves a resumable full-state checkpoint.
        if train_cfg.out_dir:
            from dsen2_tpu.weights.checkpoint import save_train_state

            path = os.path.join(train_cfg.out_dir, f"{train_cfg.model_nr}interrupted")
            save_train_state(
                path, live["params"], live["opt_state"], epoch=len(history["loss"])
            )
            print(f"interrupted: full train state saved to {path}")
        raise

    return (
        TrainState(
            params=live["params"], opt_state=live["opt_state"],
            epoch=len(history["loss"]),
        ),
        history,
    )


def _epoch_loop(
    train_cfg, train_inputs, train_labels, val_inputs, val_labels,
    live, train_step, eval_step, plateau, logger, ckpt,
    n, rng, history, epochs, verbose, place_batch,
):
    params, opt_state = live["params"], live["opt_state"]
    for epoch in range(epochs):
        t0 = time.time()
        losses, mses, weights = [], [], []
        for idx in _batches(n, train_cfg.batch_size, rng, shuffle=True):
            binputs = place_batch([a[idx] for a in train_inputs])
            btarget = place_batch([train_labels[idx]])[0]
            params, opt_state, loss, mse_ = train_step(params, opt_state, binputs, btarget)
            losses.append(loss)
            mses.append(mse_)
            weights.append(len(idx))
        w = np.asarray(weights, np.float64)
        loss = float(np.average([float(x) for x in losses], weights=w))
        mse_ = float(np.average([float(x) for x in mses], weights=w))

        # Validation in batches (val set may be large).
        vl, vw = [], []
        for idx in _batches(val_labels.shape[0], train_cfg.batch_size, rng, shuffle=False):
            vi = place_batch([a[idx] for a in val_inputs])
            vt = place_batch([val_labels[idx]])[0]
            l, _ = eval_step(params, vi, vt)
            vl.append(float(l))
            vw.append(len(idx))
        val_loss = float(np.average(vl, weights=np.asarray(vw, np.float64)))

        new_lr = plateau.step(val_loss)
        if new_lr != float(opt_state.hyperparams["learning_rate"]):
            opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr, jnp.float32)

        # Publish the state BEFORE the history appends: if an interrupt
        # lands between them the checkpoint under-counts the epoch (safe:
        # one epoch re-runs on resume) rather than skipping one.
        live["params"], live["opt_state"] = params, opt_state
        history["loss"].append(loss)
        history["val_loss"].append(val_loss)
        history["mse"].append(mse_)
        history["lr"].append(new_lr)
        if logger:
            logger.on_epoch_end(epoch, loss, val_loss, new_lr, last=epoch == epochs - 1)
        if ckpt:
            ckpt.maybe_save(val_loss, params)
        if verbose:
            print(
                f"epoch {epoch}: loss {loss:.3e} val {val_loss:.3e} "
                f"lr {new_lr:.1e} ({time.time() - t0:.1f}s)"
            )
