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

__all__ = ["TrainState", "fit", "make_optimizer", "restore_fit_state"]

# Streaming datasets: a val split up to this size is concatenated in RAM
# once (load_val); beyond it, fit streams val batches tile-by-tile per
# epoch (bounded RSS at the cost of re-reading the tiles each eval).
VAL_STREAM_THRESHOLD_BYTES = 1 << 30


@dataclasses.dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    epoch: int = 0


def make_optimizer(train_cfg: TrainConfig):
    """The training optimizer: Keras-2 Nadam with the LR injected as
    optimizer state (inject_hyperparams) so plateau reductions are a state
    mutation, not a retrace."""
    return optax.inject_hyperparams(nadam_keras)(
        learning_rate=train_cfg.lr,
        beta1=train_cfg.beta1,
        beta2=train_cfg.beta2,
        eps=train_cfg.eps,
        schedule_decay=train_cfg.schedule_decay,
    )


def restore_fit_state(
    path: str, cfg: ModelConfig, train_cfg: TrainConfig, warn_mismatch: bool = True
) -> Dict:
    """Restore a full-state checkpoint written by fit() into keyword
    arguments for fit(): {'params', 'opt_state', 'start_epoch',
    'plateau_state', 'history', 'best_val'} (plus 'train_flags' — the
    checkpointed run's recorded flags, NOT a fit() kwarg: pop it before
    **-splatting). Resuming with these continues the EXACT trajectory
    (optimizer moments, plateau scheduler, shuffle order) — the capability
    the reference's weights-only --resume lacks
    (training/supres_train.py:181-185). Set warn_mismatch=False when the
    caller reconciles flags itself (cli/train.py adopts the recorded values
    unless explicitly overridden)."""
    from dsen2_tpu.weights.checkpoint import restore_train_state

    # Two-pass restore: raw first (extra is plain dicts of arrays), then
    # typed with a template so opt_state comes back as the real optax
    # NamedTuple structure rather than nested dicts.
    raw = restore_train_state(path)
    opt = make_optimizer(train_cfg)
    params_t = s2net.init_params(jax.random.PRNGKey(train_cfg.seed), cfg)
    like = {
        "params": params_t,
        "opt_state": opt.init(params_t),
        "epoch": np.asarray(0),
        "extra": raw["extra"],
    }
    st = restore_train_state(path, like=like)
    extra = st["extra"]
    plateau_state = {k: v.item() for k, v in extra["plateau"].items()}
    history = {k: list(np.asarray(v, np.float64)) for k, v in extra["history"].items()}
    out = {
        "params": st["params"],
        "opt_state": st["opt_state"],
        "start_epoch": int(st["epoch"]),
        "plateau_state": plateau_state,
        "history": history,
        "best_val": float(extra["best_val"]),
    }
    # Validate the resume invocation against the checkpoint's recorded
    # run-level flags (absent in checkpoints written before they existed).
    flags = extra.get("train_flags")
    if flags is not None:
        recorded = {k: np.asarray(v).item() for k, v in flags.items()}
        current = {
            "lr": train_cfg.lr,
            "batch_size": train_cfg.batch_size,
            "augment": train_cfg.augment,
            "seed": train_cfg.seed,
        }
        mismatched = {
            k: (recorded[k], current[k])
            for k in recorded
            if k in current and recorded[k] != current[k]
        }
        if mismatched and warn_mismatch:
            import warnings

            detail = ", ".join(
                f"{k}: checkpoint={a!r} vs invocation={b!r}"
                for k, (a, b) in sorted(mismatched.items())
            )
            warnings.warn(
                "resume flags differ from the checkpointed run — the "
                f"trajectory will NOT continue exactly ({detail})",
                stacklevel=2,
            )
        out["train_flags"] = recorded
    return out


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
    opt_state: Optional[optax.OptState] = None,
    start_epoch: int = 0,
    plateau_state: Optional[Dict] = None,
    history: Optional[Dict[str, list]] = None,
    best_val: Optional[float] = None,
    force_lr: Optional[float] = None,
    train_flags: Optional[Dict] = None,  # checkpoint metadata; accepted so
    # restore_fit_state(...) can be **-splatted — reconciliation against the
    # invocation's flags is the caller's job (restore warns by default).
) -> Tuple[TrainState, Dict[str, list]]:
    """Train; returns (final state, history). Checkpoints/logs go to
    train_cfg.out_dir when set (filename convention
    {model_nr}lr_{lr:.0e}.hdf5 like training/supres_train.py:195).

    Pass opt_state/start_epoch/plateau_state/history/best_val (e.g. via
    restore_fit_state) to resume the exact trajectory of an earlier run.

    `train_inputs` may instead be a data/streaming.py::StreamingPatchDataset
    (pass train_labels=None); the epoch then streams tile archives off disk
    with bounded RAM, and the val split defaults to ds.load_val() when
    val_labels is None."""
    stream_ds = train_inputs if hasattr(train_inputs, "epoch_batches") else None
    stream_val = False
    if stream_ds is not None:
        if stage_data:
            raise ValueError(
                "stage_data=True is incompatible with a streaming dataset "
                "(streaming exists precisely because the data exceeds memory)"
            )
        if val_labels is None:
            # The val split streams tile-by-tile each epoch ONLY when a
            # one-time concatenated load would strain host RAM — streaming
            # re-decodes every tile each eval, so small splits load once.
            # Batch boundaries and sample order are identical either way,
            # so the val loss does not depend on this choice.
            if stream_ds.val_nbytes() > VAL_STREAM_THRESHOLD_BYTES:
                stream_val = True
            else:
                val_inputs, val_labels = stream_ds.load_val()
    if params is None:
        params = s2net.init_params(jax.random.PRNGKey(train_cfg.seed), cfg)
    if mesh is None and jax.device_count() > 1:
        mesh = make_mesh()

    opt = make_optimizer(train_cfg)
    if opt_state is None:
        opt_state = opt.init(params)

    if mesh is not None:
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)

    staged = None
    if stage_data:
        # Fast path: the whole dataset lives in HBM (sharded over the batch
        # axis under a mesh) and every epoch runs as ONE jitted lax.scan —
        # only the shuffle permutation and scalar metrics cross the host
        # boundary per epoch. Trajectory is exactly the per-step loop's
        # (train/staged.py; the all-in-RAM design of the reference moved to
        # HBM, training/README.md:18).
        from dsen2_tpu.train.staged import stage_dataset

        staged = stage_dataset(
            cfg, opt, train_cfg.batch_size,
            train_inputs, train_labels, val_inputs, val_labels,
            mesh=mesh, precision=precision, remat=remat,
            augment=train_cfg.augment,
        )

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
    if plateau_state:
        for k, v in plateau_state.items():
            setattr(plateau, k, type(getattr(plateau, k))(v))
    if force_lr is not None:
        # Explicit resume-time lr override: the restored optimizer state and
        # plateau scheduler both carry the checkpointed lr and would
        # otherwise silently win over train_cfg.lr (the training itself
        # reads opt_state.hyperparams, not train_cfg).
        plateau.lr = float(force_lr)
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                force_lr, jnp.float32
            )
    history = history if history is not None else {
        "loss": [], "val_loss": [], "mse": [], "lr": []
    }
    logger = ckpt = None
    if train_cfg.out_dir:
        os.makedirs(train_cfg.out_dir, exist_ok=True)
        logger = LossLogger(
            train_cfg.out_dir, train_cfg.model_nr, train_cfg.lr,
            append=start_epoch > 0,
        )
        logger.losses = list(history["loss"])
        logger.val_losses = list(history["val_loss"])
        ckpt = BestCheckpoint(
            os.path.join(
                train_cfg.out_dir, f"{train_cfg.model_nr}lr_{train_cfg.lr:.0e}"
            ),
            verbose=verbose,
        )
        if best_val is not None:
            ckpt.best = best_val

    n = stream_ds.n_train if stream_ds is not None else train_labels.shape[0]
    rng = np.random.default_rng(train_cfg.seed)
    # Fast-forward the shuffle stream over already-completed epochs so a
    # resumed run sees the same batch order the uninterrupted run would.
    # (Streaming epochs draw from a per-(seed,epoch) rng instead and consume
    # nothing from this stream.)
    if stream_ds is None:
        for _ in range(start_epoch):
            rng.permutation(n)
    epochs = train_cfg.epochs if epochs is None else epochs

    # `live` is updated by the epoch loop after every completed epoch so the
    # interrupt handler saves the CURRENT state, not fit's initial bindings.
    live = {"params": params, "opt_state": opt_state}

    def save_state(tag: str = "state") -> None:
        """Full-state checkpoint: params + optimizer + plateau + history."""
        if not train_cfg.out_dir:
            return
        from dsen2_tpu.weights.checkpoint import save_train_state

        extra = {
            "plateau": {
                "lr": np.asarray(plateau.lr),
                "best": np.asarray(plateau.best),
                "wait": np.asarray(plateau.wait),
                "cooldown_counter": np.asarray(plateau.cooldown_counter),
            },
            "best_val": np.asarray(ckpt.best if ckpt else np.inf),
            "history": {k: np.asarray(v, np.float64) for k, v in history.items()},
            # The run's trajectory-defining flags, so resume can detect a
            # mismatched invocation instead of silently continuing with
            # different hyperparameters (initial lr lives in opt_state; this
            # records the run-level settings).
            "train_flags": {
                "lr": np.asarray(train_cfg.lr),
                "batch_size": np.asarray(train_cfg.batch_size),
                "augment": np.asarray(train_cfg.augment),
                "seed": np.asarray(train_cfg.seed),
            },
        }
        path = os.path.join(train_cfg.out_dir, f"{train_cfg.model_nr}{tag}")
        save_train_state(
            path, live["params"], live["opt_state"],
            epoch=len(history["loss"]), extra=extra,
        )

    val_producer_fn = None
    if stream_val:
        def val_producer_fn():
            def produce():
                for cnt, bin_, blb in stream_ds.val_batches(train_cfg.batch_size):
                    yield cnt, place_batch(bin_), place_batch([blb])[0]

            return produce()

    try:
        _epoch_loop(
            train_cfg, train_inputs, train_labels, val_inputs, val_labels,
            live, train_step, eval_step, plateau, logger, ckpt,
            n, rng, history, start_epoch, epochs, verbose, place_batch,
            save_state, staged, stream_ds, val_producer_fn,
        )
    except KeyboardInterrupt:
        # Failure handling the reference lacks (SURVEY.md §5.3): an
        # interrupted run leaves a resumable full-state checkpoint.
        if train_cfg.out_dir:
            save_state("interrupted")
            print(
                "interrupted: full train state saved to "
                + os.path.join(train_cfg.out_dir, f"{train_cfg.model_nr}interrupted")
            )
        raise

    return (
        TrainState(
            params=live["params"], opt_state=live["opt_state"],
            epoch=len(history["loss"]),
        ),
        history,
    )


def _prefetch(gen, depth: int = 2):
    """Run a batch-producing generator on a background thread with a bounded
    queue so host indexing + device_put of batch k+1 overlaps step k
    (double-buffering for the non-staged path; the staged path has no
    per-step transfers at all).

    The producer's puts poll a stop event so it can never block forever on a
    full queue when the consumer abandons the epoch early (train_step raise,
    KeyboardInterrupt) — otherwise the thread plus depth+1 device-resident
    batches would leak per aborted epoch."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def run():
        try:
            for item in gen:
                if not put(("ok", item)):
                    return
        except BaseException as e:  # noqa: BLE001 — reraised on the consumer
            put(("err", e))
            return
        put(("end", None))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            kind, item = q.get()
            if kind == "err":
                raise item
            if kind == "end":
                return
            yield item
    finally:
        stop.set()
        t.join()
        # Drop buffered batches so their device memory frees promptly.
        while not q.empty():
            q.get_nowait()


def _epoch_loop(
    train_cfg, train_inputs, train_labels, val_inputs, val_labels,
    live, train_step, eval_step, plateau, logger, ckpt,
    n, rng, history, start_epoch, epochs, verbose, place_batch,
    save_state, staged=None, stream_ds=None, val_producer_fn=None,
):
    params, opt_state = live["params"], live["opt_state"]
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        if staged is not None:
            loss, mse_, val_loss, params, opt_state = _staged_epoch(
                staged, train_cfg, params, opt_state, rng, n, epoch
            )
        else:
            if stream_ds is not None:
                producer = _stream_producer(
                    stream_ds, train_cfg, epoch, place_batch
                )
            else:
                producer = _host_producer(
                    train_cfg, train_inputs, train_labels, rng, n,
                    place_batch, epoch,
                )
            loss, mse_, val_loss, params, opt_state = _run_host_epoch(
                producer, train_cfg, val_inputs, val_labels,
                params, opt_state, train_step, eval_step, place_batch,
                val_producer_fn,
            )

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
        # Periodic full-state checkpoint (SIGKILL-safe resume, unlike the
        # interrupt-only save) + one on the final epoch so finished runs can
        # be extended later.
        done = len(history["loss"])
        if train_cfg.state_every and (
            done % train_cfg.state_every == 0 or epoch == epochs - 1
        ):
            save_state()
        if verbose:
            print(
                f"epoch {epoch}: loss {loss:.3e} val {val_loss:.3e} "
                f"lr {new_lr:.1e} ({time.time() - t0:.1f}s)"
            )


def _staged_epoch(staged, train_cfg, params, opt_state, rng, n, epoch):
    """One epoch on the HBM-resident dataset: a single scanned device call
    for training and one for validation (train/staged.py)."""
    from dsen2_tpu.train.staged import epoch_aug_codes, pad_perm

    idx, mask = pad_perm(rng.permutation(n), train_cfg.batch_size)
    aug = epoch_aug_codes(train_cfg.seed, epoch, *idx.shape)
    params, opt_state, loss, mse_ = staged.train_epoch(
        params, opt_state, staged.train_inputs, staged.train_labels,
        jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(aug),
    )
    vloss, _ = staged.eval_epoch(
        params, staged.val_inputs, staged.val_labels, staged.val_idx, staged.val_mask
    )
    return float(loss), float(mse_), float(vloss), params, opt_state


def _epoch_augmenter(train_cfg, epoch):
    """Returns augment(arrs, step_i, count) applying the per-(seed,epoch)
    dihedral codes, or a passthrough when augmentation is off."""
    if not train_cfg.augment:
        return lambda arrs, step_i, count: arrs
    from dsen2_tpu.train.staged import dihedral_np, epoch_aug_codes

    # Codes are consumed positionally; streaming epochs don't know their
    # exact step count up front (carry across tiles), so the table grows
    # on demand (epoch_aug_codes is a pure function of (seed, epoch, shape),
    # and a larger table is a prefix-extension of a smaller one).
    state = {"codes": None}

    def augment(arrs, step_i, count):
        if state["codes"] is None or step_i >= state["codes"].shape[0]:
            grow = max(64, 2 * (step_i + 1))
            state["codes"] = epoch_aug_codes(
                train_cfg.seed, epoch, grow, train_cfg.batch_size
            )
        c = state["codes"][step_i, :count]
        return [
            np.stack([dihedral_np(a[j], c[j]) for j in range(count)])
            for a in arrs
        ]

    return augment


def _host_producer(train_cfg, train_inputs, train_labels, rng, n, place_batch, epoch):
    """Batch producer over in-RAM arrays: global shuffle (Keras semantics)."""
    perm = rng.permutation(n)
    augment = _epoch_augmenter(train_cfg, epoch)

    def produce():
        for step_i, i in enumerate(range(0, n, train_cfg.batch_size)):
            idx = perm[i : i + train_cfg.batch_size]
            arrs = augment(
                [a[idx] for a in train_inputs] + [train_labels[idx]],
                step_i, len(idx),
            )
            yield len(idx), place_batch(arrs[:-1]), place_batch([arrs[-1]])[0]

    return produce()


def _stream_producer(stream_ds, train_cfg, epoch, place_batch):
    """Batch producer over a StreamingPatchDataset (tile-shuffled stream)."""
    augment = _epoch_augmenter(train_cfg, epoch)

    def produce():
        for step_i, (cnt, bin_, blb) in enumerate(
            stream_ds.epoch_batches(epoch, train_cfg.batch_size)
        ):
            arrs = augment(list(bin_) + [blb], step_i, cnt)
            yield cnt, place_batch(arrs[:-1]), place_batch([arrs[-1]])[0]

    return produce()


def _run_host_epoch(
    producer, train_cfg, val_inputs, val_labels,
    params, opt_state, train_step, eval_step, place_batch,
    val_producer_fn=None,
):
    """One epoch fed from the host, with background double-buffering.
    val_producer_fn (streaming datasets) replaces the in-RAM val arrays
    with a per-epoch bounded-memory batch producer."""
    losses, mses, weights = [], [], []
    for cnt, binputs, btarget in _prefetch(producer):
        params, opt_state, loss, mse_ = train_step(params, opt_state, binputs, btarget)
        losses.append(loss)
        mses.append(mse_)
        weights.append(cnt)
    w = np.asarray(weights, np.float64)
    loss = float(np.average([float(x) for x in losses], weights=w))
    mse_ = float(np.average([float(x) for x in mses], weights=w))

    if val_producer_fn is not None:
        val_producer = val_producer_fn()
    else:
        n_val = val_labels.shape[0]

        def produce_val():
            for i in range(0, n_val, train_cfg.batch_size):
                idx = np.arange(i, min(i + train_cfg.batch_size, n_val))
                yield (
                    len(idx),
                    place_batch([a[idx] for a in val_inputs]),
                    place_batch([val_labels[idx]])[0],
                )

        val_producer = produce_val()

    vl, vw = [], []
    for cnt, vi, vt in _prefetch(val_producer):
        l, _ = eval_step(params, vi, vt)
        vl.append(float(l))
        vw.append(cnt)
    val_loss = float(np.average(vl, weights=np.asarray(vw, np.float64)))
    return loss, mse_, val_loss, params, opt_state
