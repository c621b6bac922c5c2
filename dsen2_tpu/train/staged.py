"""HBM-resident scanned training epochs — the TPU-fast input pipeline.

The reference feeds training from host RAM every step
(training/supres_train.py:218-230 via Keras fit; training/README.md:18
documents the all-in-RAM design). On TPU the per-step host->device transfer
is the bottleneck, so here the whole dataset is staged into HBM once and an
entire epoch runs as ONE jitted `lax.scan` over batches: per epoch, only the
shuffle permutation (N int32, h2d) and four scalar metrics (d2h) cross the
host boundary.

Semantics are EXACTLY the reference fit loop's (and train/loop.py's
per-step path): global shuffle, no samples dropped. Static shapes are kept
by padding the final short batch and masking it out of the loss/gradient —
a masked mean over a padded batch equals the plain mean over the short
batch, so the trajectory is bitwise-equivalent to the per-step loop (tested
in tests/test_train.py::TestStagedEpochs).

Under a mesh the staged arrays shard over the batch (N) axis and each
scanned step constrains its gathered batch to the same sharding; XLA
inserts the index-gather collectives and the gradient all-reduce from the
annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dsen2_tpu.core.config import ModelConfig
from dsen2_tpu.models import s2net
# dihedral ops live in ops/dihedral.py (shared with inference-time
# self-ensembling); re-exported here for the augmentation call sites.
from dsen2_tpu.ops.dihedral import dihedral, dihedral_np
from dsen2_tpu.ops.dihedral import dihedral_batch as _dihedral_batch
from dsen2_tpu.parallel.mesh import batch_sharding, replicated

__all__ = [
    "StagedData", "stage_dataset", "make_staged_epoch_fns", "pad_perm",
    "dihedral", "dihedral_np", "epoch_aug_codes",
]




def epoch_aug_codes(seed: int, epoch: int, steps: int, batch: int) -> np.ndarray:
    """Deterministic per-epoch augmentation codes [steps, batch] in [0, 8).
    Keyed by (seed, epoch) so resumed runs draw identical codes without
    fast-forwarding a stream."""
    rng = np.random.default_rng([seed, epoch])
    return rng.integers(0, 8, size=(steps, batch), dtype=np.int32)


def pad_perm(perm: np.ndarray, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Reshape a sample-index permutation into [steps, batch] index and
    f32 mask arrays, padding the final short batch with index 0 / mask 0."""
    n = len(perm)
    steps = -(-n // batch_size)
    pad = steps * batch_size - n
    idx = np.concatenate([perm, np.zeros(pad, perm.dtype)])
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return (
        idx.astype(np.int32).reshape(steps, batch_size),
        mask.reshape(steps, batch_size),
    )


@dataclasses.dataclass
class StagedData:
    """Device-resident dataset + the jitted epoch programs."""

    train_inputs: Tuple[jax.Array, ...]
    train_labels: jax.Array
    val_inputs: Tuple[jax.Array, ...]
    val_labels: jax.Array
    val_idx: jax.Array  # [S, B] int32, fixed order
    val_mask: jax.Array  # [S, B] f32
    train_epoch: Callable
    eval_epoch: Callable


def _stage(arr: np.ndarray, mesh) -> jax.Array:
    """Put one [N, ...] array on device; under a mesh, shard over N (rows
    padded to a device-count multiple — padding rows are never indexed
    because permutations only reference real rows)."""
    if mesh is None:
        return jnp.asarray(arr)
    ndev = mesh.devices.size
    n = arr.shape[0]
    if n % ndev:
        pad = ndev - n % ndev
        arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return jax.device_put(arr, batch_sharding(mesh, arr.ndim))


def stage_dataset(
    cfg: ModelConfig,
    opt: optax.GradientTransformation,
    batch_size: int,
    train_inputs: Sequence[np.ndarray],
    train_labels: np.ndarray,
    val_inputs: Sequence[np.ndarray],
    val_labels: np.ndarray,
    mesh=None,
    precision: str = "high",
    remat: bool = False,
    augment: bool = False,
) -> StagedData:
    """Stage the full dataset into HBM and build the scanned epoch fns."""
    t_in = tuple(_stage(np.asarray(a), mesh) for a in train_inputs)
    t_lb = _stage(np.asarray(train_labels), mesh)
    v_in = tuple(_stage(np.asarray(a), mesh) for a in val_inputs)
    v_lb = _stage(np.asarray(val_labels), mesh)
    vi, vm = pad_perm(np.arange(val_labels.shape[0]), batch_size)
    place = replicated(mesh) if mesh is not None else None
    val_idx = jnp.asarray(vi) if place is None else jax.device_put(vi, place)
    val_mask = jnp.asarray(vm) if place is None else jax.device_put(vm, place)
    train_epoch, eval_epoch = make_staged_epoch_fns(
        cfg, opt, mesh=mesh, precision=precision, remat=remat, augment=augment
    )
    return StagedData(
        train_inputs=t_in, train_labels=t_lb,
        val_inputs=v_in, val_labels=v_lb,
        val_idx=val_idx, val_mask=val_mask,
        train_epoch=train_epoch, eval_epoch=eval_epoch,
    )


def make_staged_epoch_fns(
    cfg: ModelConfig,
    opt: optax.GradientTransformation,
    mesh=None,
    precision: str = "high",
    remat: bool = False,
    augment: bool = False,
) -> Tuple[Callable, Callable]:
    """Build (train_epoch, eval_epoch):

    train_epoch(params, opt_state, inputs, labels, idx[S,B], mask[S,B],
        aug[S,B]) -> (params, opt_state, loss, mse)  [weighted like Keras fit]
    eval_epoch(params, inputs, labels, idx, mask) -> (loss, mse)

    With augment=True, each training sample gets the dihedral symmetry
    aug[s,b] applied to every input AND the label (geometric consistency);
    validation is never augmented.
    """

    def constrain(x):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))

    def batch_of(inputs, labels, idx):
        binputs = tuple(constrain(jnp.take(a, idx, axis=0)) for a in inputs)
        btarget = constrain(jnp.take(labels, idx, axis=0))
        return binputs, btarget

    def masked_metrics(pred, target, mask):
        # Per-sample means, then mask-weighted mean: equals the plain batch
        # mean when the batch is full, and the short-batch mean when padded.
        per_mae = jnp.mean(jnp.abs(pred - target), axis=(1, 2, 3))
        per_mse = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.sum(per_mae * mask) / denom, jnp.sum(per_mse * mask) / denom

    def loss_fn(params, binputs, btarget, mask):
        pred = s2net.apply(params, binputs, cfg, precision=precision, remat=remat)
        loss, mse_ = masked_metrics(pred, btarget, mask)
        return loss, mse_

    def train_epoch(params, opt_state, inputs, labels, idx, mask, aug):
        def body(carry, step):
            params, opt_state = carry
            bidx, bmask, baug = step
            binputs, btarget = batch_of(inputs, labels, bidx)
            if augment:
                binputs = tuple(_dihedral_batch(a, baug) for a in binputs)
                btarget = _dihedral_batch(btarget, baug)
            (loss, mse_), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, binputs, btarget, bmask
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, mse_, jnp.sum(bmask))

        (params, opt_state), (losses, mses, counts) = jax.lax.scan(
            body, (params, opt_state), (idx, mask, aug)
        )
        w = counts / jnp.sum(counts)
        return params, opt_state, jnp.sum(losses * w), jnp.sum(mses * w)

    def eval_epoch(params, inputs, labels, idx, mask):
        def body(carry, step):
            bidx, bmask = step
            binputs, btarget = batch_of(inputs, labels, bidx)
            loss, mse_ = loss_fn(params, binputs, btarget, bmask)
            c = jnp.sum(bmask)
            return carry, (loss * c, mse_ * c, c)

        _, (ls, ms, cs) = jax.lax.scan(body, None, (idx, mask))
        total = jnp.sum(cs)
        return jnp.sum(ls) / total, jnp.sum(ms) / total

    return jax.jit(train_epoch), jax.jit(eval_epoch)
