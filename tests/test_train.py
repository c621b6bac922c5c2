"""Training stack tests: Keras-2 Nadam parity vs torch.optim.NAdam (the same
published algorithm), plateau-scheduler semantics, and a short end-to-end fit
that must reduce loss and checkpoint, including on the 8-device CPU mesh."""

import time
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsen2_tpu.core.config import ModelConfig, TrainConfig
from dsen2_tpu.models import s2net
from dsen2_tpu.train.callbacks import ReduceLROnPlateau
from dsen2_tpu.train.loop import fit
from dsen2_tpu.train.nadam import nadam_keras


class TestNadamParity:
    def test_matches_torch_nadam(self):
        """torch.optim.NAdam implements the same Dozat Nadam with the
        0.96^t momentum-decay schedule Keras 2 uses; trajectories must
        match to f32 tolerance over 50 steps."""
        torch = pytest.importorskip("torch")

        w0 = np.linspace(-1.0, 1.0, 12).astype(np.float32).reshape(3, 4)
        grads_seq = [
            np.cos(np.arange(12, dtype=np.float32) * (i + 1)).reshape(3, 4) * 0.3
            for i in range(50)
        ]

        tw = torch.nn.Parameter(torch.tensor(w0.copy()))
        topt = torch.optim.NAdam(
            [tw], lr=1e-3, betas=(0.9, 0.999), eps=1e-8, momentum_decay=0.004
        )
        for g in grads_seq:
            topt.zero_grad()
            tw.grad = torch.tensor(g)
            topt.step()

        opt = nadam_keras(learning_rate=1e-3, schedule_decay=0.004)
        params = jnp.asarray(w0)
        state = opt.init(params)
        for g in grads_seq:
            updates, state = opt.update(jnp.asarray(g), state)
            params = params + updates

        np.testing.assert_allclose(
            np.asarray(params), tw.detach().numpy(), rtol=2e-5, atol=2e-6
        )

    def test_descends_quadratic(self):
        opt = nadam_keras(learning_rate=0.1)
        x = jnp.asarray(5.0)
        state = opt.init(x)
        for _ in range(200):
            g = 2.0 * x
            upd, state = opt.update(g, state)
            x = x + upd
        assert abs(float(x)) < 1e-2


class TestReduceLROnPlateau:
    def test_reduces_after_patience(self):
        sched = ReduceLROnPlateau(lr=1e-4, patience=3, cooldown=2, verbose=False)
        lr = sched.step(1.0)
        assert lr == 1e-4
        for _ in range(3):
            lr = sched.step(1.0)  # no improvement
        assert lr == 5e-5

    def test_cooldown_blocks_consecutive_reductions(self):
        sched = ReduceLROnPlateau(lr=1e-4, patience=1, cooldown=5, verbose=False)
        sched.step(1.0)
        lr = sched.step(1.0)
        assert lr == 5e-5
        for _ in range(4):  # inside cooldown: no further reduction
            lr = sched.step(1.0)
        assert lr == 5e-5

    def test_min_lr_floor(self):
        sched = ReduceLROnPlateau(
            lr=2e-5, patience=1, cooldown=0, min_lr=1e-5, verbose=False
        )
        sched.step(1.0)
        for _ in range(10):
            lr = sched.step(1.0)
        assert lr == 1e-5

    def test_improvement_resets_wait(self):
        sched = ReduceLROnPlateau(lr=1e-4, patience=2, cooldown=0, verbose=False)
        sched.step(1.0)
        sched.step(1.0)  # wait=1
        sched.step(0.5)  # improvement resets
        lr = sched.step(0.5 + 1e-9)  # not an improvement; wait=1
        assert lr == 1e-4


class TestFit:
    @pytest.fixture(scope="class")
    def toy_data(self):
        rng = np.random.default_rng(0)
        n = 64
        x10 = rng.random((n, 16, 16, 4), dtype=np.float32)
        x20 = rng.random((n, 16, 16, 6), dtype=np.float32)
        label = (x20 * 1.5 + 0.1).astype(np.float32)
        return (x10[:48], x20[:48]), label[:48], (x10[48:], x20[48:]), label[48:]

    def test_loss_decreases_and_checkpoints(self, toy_data, tmp_path):
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(
            lr=1e-3, batch_size=16, out_dir=str(tmp_path), model_nr="s2_999_"
        )
        tr_in, tr_lb, va_in, va_lb = toy_data
        state, hist = fit(
            cfg, tcfg, tr_in, tr_lb, va_in, va_lb, epochs=8, verbose=False, mesh=None
        )
        assert hist["loss"][-1] < hist["loss"][0]
        assert (tmp_path / "s2_999_lr_1e-03.hdf5").exists()
        assert (tmp_path / "s2_999_lr_1e-03.npz").exists()
        assert (tmp_path / "s2_999__lr_1.0e-03.txt").exists()

    def test_mesh_fit_matches_single(self, toy_data):
        """DP over the 8-device CPU mesh must follow the same trajectory as
        single-device (same batches, grads all-reduced)."""
        from dsen2_tpu.parallel.mesh import make_mesh

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16)
        tr_in, tr_lb, va_in, va_lb = toy_data
        _, h1 = fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb, epochs=3, verbose=False, mesh=None)
        _, h8 = fit(
            cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
            epochs=3, verbose=False, mesh=make_mesh(data=8),
        )
        np.testing.assert_allclose(h1["loss"], h8["loss"], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(h1["val_loss"], h8["val_loss"], rtol=1e-4, atol=1e-6)

    def test_resume_from_checkpoint(self, toy_data, tmp_path):
        from dsen2_tpu.weights import load_keras_weights

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16, out_dir=str(tmp_path), model_nr="s2_998_")
        tr_in, tr_lb, va_in, va_lb = toy_data
        fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb, epochs=2, verbose=False, mesh=None)
        params = load_keras_weights(str(tmp_path / "s2_998_lr_1e-03.hdf5"), cfg)
        state, hist = fit(
            cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
            params=params, epochs=2, verbose=False, mesh=None,
        )
        assert np.isfinite(hist["loss"]).all()


class TestInterruptCheckpoint:
    def test_interrupt_saves_current_state(self, tmp_path):
        """Ctrl-C mid-run must persist the CURRENT params, not fit's
        initial bindings (regression for the _epoch_loop refactor)."""
        from unittest import mock

        from dsen2_tpu.weights.checkpoint import restore_train_state

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16, out_dir=str(tmp_path), model_nr="s2_997_")
        rng_l = np.random.default_rng(0)
        x10 = rng_l.random((32, 16, 16, 4), dtype=np.float32)
        x20 = rng_l.random((32, 16, 16, 6), dtype=np.float32)
        lb = (x20 * 1.5).astype(np.float32)

        init_params = s2net.init_params(jax.random.PRNGKey(tcfg.seed), cfg)

        calls = {"n": 0}
        orig = ReduceLROnPlateau.step

        def boom(self, val_loss):
            calls["n"] += 1
            if calls["n"] >= 3:
                raise KeyboardInterrupt
            return orig(self, val_loss)

        with mock.patch.object(ReduceLROnPlateau, "step", boom):
            with pytest.raises(KeyboardInterrupt):
                fit(cfg, tcfg, (x10[:24], x20[:24]), lb[:24], (x10[24:], x20[24:]), lb[24:],
                    epochs=10, verbose=False, mesh=None)

        restored = restore_train_state(str(tmp_path / "s2_997_interrupted"))
        # the interrupt fires DURING epoch 3 (plateau.step call #3), so two
        # epochs completed -> epoch records completed count
        assert int(restored["epoch"]) == 2
        # params must differ from the fresh init (training progressed)
        diff = np.abs(
            np.asarray(restored["params"]["head"]["w"]) - np.asarray(init_params["head"]["w"])
        ).max()
        assert diff > 0, "interrupt checkpoint saved the initial state"


class TestStagedEpochs:
    """The HBM-resident scanned-epoch path (stage_data=True) must follow the
    exact trajectory of the per-step host-fed loop — same shuffle stream,
    masked short batches equal to Keras's short-batch steps — on one device
    and on the 8-device CPU mesh."""

    def _data(self, n=42):  # 42 = 2*16 + 10: exercises the masked short batch
        rng = np.random.default_rng(5)
        x10 = rng.random((n, 16, 16, 4), dtype=np.float32)
        x20 = rng.random((n, 16, 16, 6), dtype=np.float32)
        lb = (x20 * 1.4 + 0.05).astype(np.float32)
        k = n - 10
        return (x10[:k], x20[:k]), lb[:k], (x10[k:], x20[k:]), lb[k:]

    @pytest.mark.parametrize("use_mesh", [False, True])
    def test_staged_matches_host_fed(self, use_mesh):
        from dsen2_tpu.parallel.mesh import make_mesh

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16)
        tr_in, tr_lb, va_in, va_lb = self._data()
        mesh = make_mesh(data=8) if use_mesh else None
        _, h_ref = fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
                       epochs=3, verbose=False, mesh=mesh, stage_data=False)
        _, h_st = fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
                      epochs=3, verbose=False, mesh=mesh, stage_data=True)
        np.testing.assert_allclose(h_st["loss"], h_ref["loss"], rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            h_st["val_loss"], h_ref["val_loss"], rtol=1e-5, atol=1e-7
        )

    def test_staged_params_match(self):
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16)
        tr_in, tr_lb, va_in, va_lb = self._data()
        s_ref, _ = fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
                       epochs=2, verbose=False, mesh=None, stage_data=False)
        s_st, _ = fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
                      epochs=2, verbose=False, mesh=None, stage_data=True)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
            ),
            s_ref.params, s_st.params,
        )


class TestAugmentation:
    def test_dihedral_matches_numpy(self):
        """The device dihedral op must equal numpy rot90/flip for all 8
        codes (and code 0 is the identity)."""
        from dsen2_tpu.train.staged import dihedral, dihedral_np

        rng = np.random.default_rng(0)
        x = rng.random((6, 6, 3)).astype(np.float32)
        for code in range(8):
            dev = np.asarray(dihedral(jnp.asarray(x), jnp.int32(code)))
            np.testing.assert_array_equal(dev, dihedral_np(x, code))
        np.testing.assert_array_equal(
            np.asarray(dihedral(jnp.asarray(x), jnp.int32(0))), x
        )

    def test_dihedral_group_is_closed_and_distinct(self):
        from dsen2_tpu.train.staged import dihedral_np

        x = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
        outs = [dihedral_np(x, c).tobytes() for c in range(8)]
        assert len(set(outs)) == 8  # all symmetries distinct on this input

    def test_staged_and_host_fed_augment_match(self):
        """Both pipelines must apply the SAME per-(seed,epoch) augmentation
        stream -> identical trajectories."""
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16, augment=True)
        rng = np.random.default_rng(11)
        n = 40
        x10 = rng.random((n, 16, 16, 4), dtype=np.float32)
        x20 = rng.random((n, 16, 16, 6), dtype=np.float32)
        lb = (x20 * 1.3).astype(np.float32)
        data = (x10[:32], x20[:32]), lb[:32], (x10[32:], x20[32:]), lb[32:]
        _, h_host = fit(cfg, tcfg, *data, epochs=2, verbose=False, mesh=None,
                        stage_data=False)
        _, h_staged = fit(cfg, tcfg, *data, epochs=2, verbose=False, mesh=None,
                          stage_data=True)
        np.testing.assert_allclose(h_staged["loss"], h_host["loss"],
                                   rtol=1e-5, atol=1e-7)
        # and augmentation actually changes the trajectory
        _, h_plain = fit(cfg, dataclasses_replace_augment(tcfg, False), *data,
                         epochs=2, verbose=False, mesh=None, stage_data=True)
        assert not np.allclose(h_plain["loss"], h_staged["loss"])


def dataclasses_replace_augment(tcfg, value):
    import dataclasses as _dc

    return _dc.replace(tcfg, augment=value)


class TestFullStateResume:
    """Exact-trajectory resume: kill-at-epoch-k + resume must equal the
    uninterrupted run (params, losses, shuffle order, optimizer moments) —
    the capability the reference's weights-only --resume lacks
    (training/supres_train.py:181-185)."""

    def _data(self):
        rng = np.random.default_rng(3)
        n = 48
        x10 = rng.random((n, 16, 16, 4), dtype=np.float32)
        x20 = rng.random((n, 16, 16, 6), dtype=np.float32)
        lb = (x20 * 1.5 + 0.1).astype(np.float32)
        return (x10[:32], x20[:32]), lb[:32], (x10[32:], x20[32:]), lb[32:]

    def test_resume_matches_uninterrupted(self, tmp_path):
        from dsen2_tpu.train.loop import restore_fit_state

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tr_in, tr_lb, va_in, va_lb = self._data()

        tc_a = TrainConfig(lr=1e-3, batch_size=16, out_dir=str(tmp_path / "a"),
                           model_nr="s2_901_", state_every=0)
        state_a, hist_a = fit(cfg, tc_a, tr_in, tr_lb, va_in, va_lb,
                              epochs=6, verbose=False, mesh=None)

        tc_b = TrainConfig(lr=1e-3, batch_size=16, out_dir=str(tmp_path / "b"),
                           model_nr="s2_902_", state_every=3)
        fit(cfg, tc_b, tr_in, tr_lb, va_in, va_lb,
            epochs=3, verbose=False, mesh=None)
        rs = restore_fit_state(str(tmp_path / "b" / "s2_902_state"), cfg, tc_b)
        assert rs["start_epoch"] == 3
        state_b, hist_b = fit(cfg, tc_b, tr_in, tr_lb, va_in, va_lb,
                              epochs=6, verbose=False, mesh=None, **rs)

        assert len(hist_b["loss"]) == 6
        np.testing.assert_allclose(hist_b["loss"], hist_a["loss"], rtol=1e-5)
        np.testing.assert_allclose(hist_b["val_loss"], hist_a["val_loss"], rtol=1e-5)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
            ),
            state_a.params, state_b.params,
        )

    def test_restore_carries_plateau_and_best(self, tmp_path):
        from dsen2_tpu.train.loop import restore_fit_state

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tr_in, tr_lb, va_in, va_lb = self._data()
        tcfg = TrainConfig(lr=1e-3, batch_size=16, out_dir=str(tmp_path),
                           model_nr="s2_903_", state_every=2)
        fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb, epochs=2, verbose=False, mesh=None)
        rs = restore_fit_state(str(tmp_path / "s2_903_state"), cfg, tcfg)
        assert rs["start_epoch"] == 2
        assert set(rs["plateau_state"]) == {"lr", "best", "wait", "cooldown_counter"}
        assert rs["best_val"] == min(rs["history"]["val_loss"])
        assert len(rs["history"]["loss"]) == 2


class TestShortBatchOnMesh:
    def test_final_short_batch_survives_sharding(self, tmp_path):
        """n % batch_size not divisible by the device count must not crash
        (the short batch is replicated instead of sharded)."""
        from dsen2_tpu.parallel.mesh import make_mesh

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16)
        rng_l = np.random.default_rng(1)
        n = 42  # 42 = 2*16 + 10; 10 % 8 != 0
        x10 = rng_l.random((n, 16, 16, 4), dtype=np.float32)
        x20 = rng_l.random((n, 16, 16, 6), dtype=np.float32)
        lb = (x20 * 1.2).astype(np.float32)
        _, hist = fit(
            cfg, tcfg, (x10[:34], x20[:34]), lb[:34], (x10[34:], x20[34:]), lb[34:],
            epochs=2, verbose=False, mesh=make_mesh(data=8),
        )
        assert np.isfinite(hist["loss"]).all()


class TestPrefetchAbort:
    def test_producer_unblocks_when_consumer_stops_early(self):
        """Abandoning the epoch mid-stream (train_step raise / interrupt)
        must not leave the producer thread blocked on a full queue."""
        import threading

        from dsen2_tpu.train.loop import _prefetch

        n_before = threading.active_count()
        produced = []

        def gen():
            for i in range(1000):
                produced.append(i)
                yield i

        for item in _prefetch(gen(), depth=2):
            if item == 1:
                break  # consumer abandons; generator close runs the cleanup

        deadline = time.time() + 5.0
        while threading.active_count() > n_before and time.time() < deadline:
            time.sleep(0.01)
        assert threading.active_count() <= n_before
        assert len(produced) < 1000  # producer stopped early, not drained

    def test_exception_from_producer_propagates(self):
        from dsen2_tpu.train.loop import _prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = _prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)


class TestTrainFlagsRecorded:
    def _data(self):
        rng = np.random.default_rng(5)
        n = 32
        x10 = rng.random((n, 16, 16, 4), dtype=np.float32)
        x20 = rng.random((n, 16, 16, 6), dtype=np.float32)
        lb = (x20 * 1.5).astype(np.float32)
        return (x10[:24], x20[:24]), lb[:24], (x10[24:], x20[24:]), lb[24:]

    def test_flags_roundtrip_and_mismatch_warns(self, tmp_path):
        from dsen2_tpu.train.loop import restore_fit_state

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tr_in, tr_lb, va_in, va_lb = self._data()
        tcfg = TrainConfig(lr=1e-3, batch_size=8, out_dir=str(tmp_path),
                           model_nr="s2_904_", state_every=2, augment=True, seed=7)
        fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb, epochs=2, verbose=False, mesh=None)

        rs = restore_fit_state(str(tmp_path / "s2_904_state"), cfg, tcfg)
        assert rs["train_flags"] == {
            "lr": 1e-3, "batch_size": 8, "augment": True, "seed": 7,
        }

        other = TrainConfig(lr=5e-4, batch_size=8, out_dir=str(tmp_path),
                            model_nr="s2_904_", augment=False, seed=7)
        with pytest.warns(UserWarning, match="resume flags differ"):
            restore_fit_state(str(tmp_path / "s2_904_state"), cfg, other)
        # warn_mismatch=False suppresses it but still returns the record
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            rs2 = restore_fit_state(
                str(tmp_path / "s2_904_state"), cfg, other, warn_mismatch=False
            )
        assert rs2["train_flags"]["augment"] is True

    def test_fit_accepts_splatted_restore(self, tmp_path):
        """fit(**restore_fit_state(...)) must keep working with the
        train_flags key present."""
        from dsen2_tpu.train.loop import restore_fit_state

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tr_in, tr_lb, va_in, va_lb = self._data()
        tcfg = TrainConfig(lr=1e-3, batch_size=8, out_dir=str(tmp_path),
                           model_nr="s2_905_", state_every=1)
        fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb, epochs=1, verbose=False, mesh=None)
        rs = restore_fit_state(str(tmp_path / "s2_905_state"), cfg, tcfg)
        _, hist = fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
                      epochs=2, verbose=False, mesh=None, **rs)
        assert len(hist["loss"]) == 2
