"""Streaming dataset loader tests: reference-format archives iterated off
disk with bounded RAM (data/streaming.py), including fit() integration.
Reference anchors: utils/patches.py:288-324 (OpenDataFiles, the all-in-RAM
design being replaced), training/create_random.py (val_index mask)."""

import os

import numpy as np
import pytest

from dsen2_tpu.core.config import ModelConfig, TrainConfig
from dsen2_tpu.data.streaming import StreamingPatchDataset
from dsen2_tpu.train.loop import fit

H = 8  # tiny patches keep the tests fast


def _write_tiles(root, counts, seed=0):
    """Tiles whose every patch is constant-valued with its GLOBAL slot index
    (so coverage and split membership are observable from the data)."""
    rng = np.random.default_rng(seed)
    train_dir = root / "train"
    os.makedirs(train_dir, exist_ok=True)
    offset = 0
    for t, n in enumerate(counts):
        tile = train_dir / f"TILE_{t}.SAFE"
        os.makedirs(tile, exist_ok=True)
        ids = np.arange(offset, offset + n, dtype=np.float32)
        base10 = np.broadcast_to(ids[:, None, None, None], (n, 4, H, H))
        base20 = np.broadcast_to(ids[:, None, None, None], (n, 6, H, H))
        np.save(tile / "data10.npy", np.ascontiguousarray(base10))
        np.save(tile / "data20.npy", np.ascontiguousarray(base20))
        np.save(tile / "data20_gt.npy", np.ascontiguousarray(base20 * 2))
        offset += n
    total = offset
    val = np.zeros(total, bool)
    val[rng.choice(total, size=total // 10, replace=False)] = True
    np.save(train_dir / "val_index.npy", val)
    return total, val


class TestStreamingDataset:
    @pytest.fixture()
    def ds_root(self, tmp_path):
        total, val = _write_tiles(tmp_path, [20, 30, 26])
        return tmp_path, total, val

    def test_split_counts(self, ds_root):
        root, total, val = ds_root
        ds = StreamingPatchDataset(str(root), run_60=False, scale=1.0)
        assert ds.n_train + ds.n_val == total
        assert ds.n_val == val.sum()

    def test_load_val_matches_mask(self, ds_root):
        root, total, val = ds_root
        ds = StreamingPatchDataset(str(root), run_60=False, scale=1.0)
        val_in, val_lb = ds.load_val()
        got = sorted(val_in[0][:, 0, 0, 0].astype(int))
        assert got == sorted(np.flatnonzero(val))
        # NHWC layout and label relation preserved
        assert val_in[0].shape == (ds.n_val, H, H, 4)
        np.testing.assert_array_equal(val_lb, 2 * val_in[1])

    def test_epoch_covers_every_sample_once(self, ds_root):
        root, total, val = ds_root
        ds = StreamingPatchDataset(str(root), run_60=False, scale=1.0)
        seen = []
        full = 0
        batches = list(ds.epoch_batches(epoch=0, batch_size=16))
        for cnt, bin_, blb in batches:
            assert cnt == blb.shape[0] == bin_[0].shape[0]
            seen.extend(bin_[0][:, 0, 0, 0].astype(int))
            full += cnt == 16
        assert sorted(seen) == sorted(np.flatnonzero(~val))
        # every batch except possibly the last is full (carry across tiles)
        assert full >= len(batches) - 1

    def test_epoch_stream_is_deterministic_per_epoch(self, ds_root):
        root, _, _ = ds_root
        ds = StreamingPatchDataset(str(root), run_60=False, scale=1.0)

        def ids(epoch):
            return [
                tuple(b[0][:, 0, 0, 0].astype(int))
                for _, b, _ in ds.epoch_batches(epoch, 16)
            ]

        assert ids(1) == ids(1)
        assert ids(1) != ids(2)

    def test_scale_applied(self, ds_root):
        root, _, _ = ds_root
        ds = StreamingPatchDataset(str(root), run_60=False, scale=2.0)
        _, bin_, blb = next(iter(ds.epoch_batches(0, 8)))
        np.testing.assert_allclose(blb, 2 * bin_[1])  # both /2, ratio kept
        assert bin_[0].max() <= (20 + 30 + 26) / 2.0

    def test_missing_val_index_raises(self, tmp_path):
        _write_tiles(tmp_path, [10])
        os.remove(tmp_path / "train" / "val_index.npy")
        with pytest.raises(FileNotFoundError, match="val_index"):
            StreamingPatchDataset(str(tmp_path), run_60=False, scale=1.0)

    def test_val_batches_match_load_val(self, ds_root):
        """val_batches must stream exactly the load_val() sequence — same
        samples, same order, same batch boundaries (so the evaluated val
        loss is bit-identical to the in-RAM path)."""
        root, _, val = ds_root
        ds = StreamingPatchDataset(str(root), run_60=False, scale=1.0)
        val_in, val_lb = ds.load_val()
        seen_in, seen_lb, counts = [], [], []
        for cnt, bin_, blb in ds.val_batches(batch_size=7):
            assert cnt == blb.shape[0] == bin_[0].shape[0]
            seen_in.append(bin_[0])
            seen_lb.append(blb)
            counts.append(cnt)
        np.testing.assert_array_equal(np.concatenate(seen_in), val_in[0])
        np.testing.assert_array_equal(np.concatenate(seen_lb), val_lb)
        assert all(c == 7 for c in counts[:-1])  # carry across tiles


class TestFitStreaming:
    def test_fit_runs_and_checkpoints(self, tmp_path):
        _write_tiles(tmp_path, [24, 18], seed=1)
        ds = StreamingPatchDataset(str(tmp_path), run_60=False, scale=70.0)
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16, out_dir=str(tmp_path / "out"),
                           model_nr="s2_909_", state_every=0)
        state, hist = fit(cfg, tcfg, ds, None, None, None,
                          epochs=3, verbose=False, mesh=None)
        assert np.isfinite(hist["loss"]).all()
        assert hist["loss"][-1] < hist["loss"][0]
        assert (tmp_path / "out" / "s2_909_lr_1e-03.hdf5").exists()

    def test_stage_data_conflict_raises(self, tmp_path):
        _write_tiles(tmp_path, [12], seed=2)
        ds = StreamingPatchDataset(str(tmp_path), run_60=False, scale=1.0)
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        with pytest.raises(ValueError, match="stage_data"):
            fit(cfg, TrainConfig(batch_size=8), ds, None, None, None,
                epochs=1, verbose=False, stage_data=True)

    def test_fit_streaming_val_matches_in_ram_val(self, tmp_path, monkeypatch):
        """fit() streams the val split when it exceeds the RAM threshold;
        the history must be bit-identical to passing load_val() arrays
        explicitly (same samples, same batch boundaries)."""
        from dsen2_tpu.train import loop as loop_mod

        _write_tiles(tmp_path, [24, 18], seed=4)
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16)

        # Force the streaming-val branch (the tiny split would otherwise
        # take the load-once path).
        monkeypatch.setattr(loop_mod, "VAL_STREAM_THRESHOLD_BYTES", 0)
        ds1 = StreamingPatchDataset(str(tmp_path), run_60=False, scale=70.0)
        assert ds1.val_nbytes() > 0
        _, hist_stream = fit(cfg, tcfg, ds1, None, None, None,
                             epochs=2, verbose=False, mesh=None)
        monkeypatch.setattr(loop_mod, "VAL_STREAM_THRESHOLD_BYTES", 1 << 30)
        ds2 = StreamingPatchDataset(str(tmp_path), run_60=False, scale=70.0)
        val_in, val_lb = ds2.load_val()
        _, hist_ram = fit(cfg, tcfg, ds2, None, val_in, val_lb,
                          epochs=2, verbose=False, mesh=None)
        assert hist_stream["val_loss"] == hist_ram["val_loss"]
        assert hist_stream["loss"] == hist_ram["loss"]

    def test_fit_streaming_with_augment(self, tmp_path):
        _write_tiles(tmp_path, [24], seed=3)
        ds = StreamingPatchDataset(str(tmp_path), run_60=False, scale=50.0)
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        tcfg = TrainConfig(lr=1e-3, batch_size=16, augment=True)
        _, hist = fit(cfg, tcfg, ds, None, None, None,
                      epochs=2, verbose=False, mesh=None)
        assert np.isfinite(hist["loss"]).all()
