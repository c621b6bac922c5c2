"""CLI tests that run end-to-end on CPU: create_patches modes on a synthetic
.npz tile, train --predict over the produced archives, demo on a synthetic
GT-bearing scene, and s2_supres argument surface."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from dsen2_tpu.cli import create_patches as cp_cli
from dsen2_tpu.cli import demo as demo_cli
from dsen2_tpu.cli import train as train_cli
from dsen2_tpu.cli.s2_supres import build_parser


@pytest.fixture(scope="module")
def synth_tile(tmp_path_factory):
    """A synthetic multi-resolution tile saved as .npz (the GDAL-free input
    path of create_patches)."""
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("tile")
    h = 432  # multiple of 36, large enough for the 128/4 test-archive grid
    # after the x2 Wald downsample (the reference's geometry assumes full
    # tiles; patch interiors must fit the simulated image)
    im10 = (rng.random((h, h, 4)) * 8000).astype(np.float32)
    im20 = (rng.random((h // 2, h // 2, 6)) * 8000).astype(np.float32)
    im60 = (rng.random((h // 6, h // 6, 2)) * 8000).astype(np.float32)
    path = str(d / "SYNTH_T00XXX.npz")
    np.savez(path, im10=im10, im20=im20, im60=im60)
    return path


class TestCreatePatchesCLI:
    def test_train_mode(self, synth_tile, tmp_path):
        rc = cp_cli.main(
            [synth_tile, "--save_prefix", str(tmp_path) + "/", "--seed", "0"]
        )
        assert rc == 0
        tiles = os.listdir(tmp_path / "train")
        assert len(tiles) == 1
        files = set(os.listdir(tmp_path / "train" / tiles[0]))
        assert files == {"data10.npy", "data20.npy", "data20_gt.npy"}

    def test_test_mode_roi_json(self, synth_tile, tmp_path):
        rc = cp_cli.main(
            [synth_tile, "--test_data", "--save_prefix", str(tmp_path) + "/"]
        )
        assert rc == 0
        tile_dir = tmp_path / "test" / os.listdir(tmp_path / "test")[0]
        roi = json.load(open(tile_dir / "roi.json"))
        assert roi == [0, 0, 216, 216]  # 10m ROI / scale 2
        assert (tile_dir / "no_tiling" / "data20_gt.npy").exists()

    def test_test60_mode(self, synth_tile, tmp_path):
        rc = cp_cli.main(
            [synth_tile, "--test_data", "--run_60", "--save_prefix", str(tmp_path) + "/"]
        )
        assert rc == 0
        tile_dir = tmp_path / "test60" / os.listdir(tmp_path / "test60")[0]
        assert (tile_dir / "data60.npy").exists()
        roi = json.load(open(tile_dir / "roi.json"))
        assert roi == [0, 0, 72, 72]

    def test_true_mode(self, synth_tile, tmp_path):
        rc = cp_cli.main(
            [synth_tile, "--true_data", "--save_prefix", str(tmp_path) + "/"]
        )
        assert rc == 0
        tile_dir = tmp_path / "true" / os.listdir(tmp_path / "true")[0]
        assert (tile_dir / "no_tiling" / "data60.npy").exists()

    def test_make_val_index(self, synth_tile, tmp_path, capsys):
        """--make-val-index (create_random.py equivalent) writes a loadable
        mask sized to the built archives, closing the CLI-only workflow:
        build patches -> make-val-index -> open_data_files succeeds."""
        from dsen2_tpu.data.patches_dataset import open_data_files

        rc = cp_cli.main(
            [synth_tile, "--save_prefix", str(tmp_path) + "/", "--seed", "0"]
        )
        assert rc == 0
        # Loader refuses without the mask and names the CLI incantation.
        with pytest.raises(FileNotFoundError, match="make-val-index"):
            open_data_files(str(tmp_path), False, 2000.0)
        rc = cp_cli.main(
            ["--make-val-index", "--save_prefix", str(tmp_path) + "/",
             "--seed", "7", "--val-fraction", "0.2"]
        )
        assert rc == 0
        mask = np.load(tmp_path / "train" / "val_index.npy")
        tile = [d for d in os.listdir(tmp_path / "train") if d.endswith("SAFE")][0]
        n = np.load(tmp_path / "train" / tile / "data10.npy").shape[0]
        assert mask.dtype == bool and mask.shape == (n,)
        assert int(mask.sum()) == int(n * 0.2)
        tr_in, tr_lb, va_in, va_lb = open_data_files(str(tmp_path), False, 2000.0)
        assert tr_lb.shape[0] + va_lb.shape[0] == n
        assert va_lb.shape[0] == int(mask.sum())

    def test_make_val_index_no_archives(self, tmp_path):
        rc = cp_cli.main(["--make-val-index", "--save_prefix", str(tmp_path) + "/"])
        assert rc == 1


class TestTrainPredictCLI:
    def test_predict_over_archive(self, synth_tile, tmp_path):
        """--predict consumes a reference-format test archive and writes the
        recomposed *-predict.npy (supres_train.py:149-179 capability)."""
        rc = cp_cli.main(
            [synth_tile, "--test_data", "--save_prefix", str(tmp_path) + "/"]
        )
        assert rc == 0
        # make a weights file for the tiny... the CLI builds the real DSen2
        # config, so save real-shaped weights
        from dsen2_tpu.core.config import dsen2_2x
        from dsen2_tpu.models import s2net
        from dsen2_tpu.weights import save_keras_weights

        params = s2net.init_params(jax.random.PRNGKey(0), dsen2_2x(False))
        wpath = str(tmp_path / "s2_032_lr_1e-04.hdf5")
        save_keras_weights(wpath, jax.tree_util.tree_map(np.asarray, params))

        rc = train_cli.main(["--predict", wpath, "--path", str(tmp_path) + "/"])
        assert rc == 0
        tile_dir = tmp_path / "test" / os.listdir(tmp_path / "test")[0]
        preds = [f for f in os.listdir(tile_dir) if f.endswith("-predict.npy")]
        assert len(preds) == 1
        arr = np.load(tile_dir / preds[0])
        assert arr.shape == (216, 216, 6)
        assert np.isfinite(arr).all()


class TestTrainResumeCLI:
    """Full-state resume driven through the CLI: train k epochs, resume from
    the periodic orbax state dir, and land on the same weights as an
    uninterrupted run (beats training/supres_train.py:181-185's weights-only
    resume)."""

    def _make_train_data(self, root):
        rng = np.random.default_rng(7)
        n = 32
        tile = root / "train" / "SYNTH_T11XXX.SAFE"
        os.makedirs(tile)
        d10 = (rng.random((n, 4, 16, 16)) * 2000).astype(np.float32)
        d20 = (rng.random((n, 6, 16, 16)) * 2000).astype(np.float32)
        np.save(tile / "data10.npy", d10)
        np.save(tile / "data20.npy", d20)
        np.save(tile / "data20_gt.npy", (d20 * 1.2).astype(np.float32))
        val = np.zeros(n, bool)
        val[::4] = True
        np.save(root / "train" / "val_index.npy", val)

    def test_cli_resume_matches_uninterrupted(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        for root in (a, b):
            self._make_train_data(root)
        common = ["--batch-size", "8", "--model-nr", "s2_555_"]
        rc = train_cli.main(["--path", str(a) + "/", "--epochs", "4"] + common)
        assert rc == 0
        rc = train_cli.main(["--path", str(b) + "/", "--epochs", "2"] + common)
        assert rc == 0
        state_dir = b / "network_data" / "s2_555_state"
        assert state_dir.is_dir()
        rc = train_cli.main(
            ["--path", str(b) + "/", "--epochs", "4", "--batch-size", "8",
             "--resume", str(state_dir)]
        )
        assert rc == 0
        wa = np.load(a / "network_data" / "s2_555_lr_1e-04.npz")
        wb = np.load(b / "network_data" / "s2_555_lr_1e-04.npz")
        assert set(wa.files) == set(wb.files)
        for k in wa.files:
            np.testing.assert_allclose(wb[k], wa[k], rtol=1e-5, atol=1e-7)

    def test_cli_resume_adopts_checkpointed_flags(self, tmp_path):
        """A bare `--resume DIR` must continue the checkpointed run's flags
        (augment/seed/lr/batch) rather than silently restart with defaults:
        resumed-without-flags == uninterrupted-with-flags."""
        a, b = tmp_path / "a", tmp_path / "b"
        for root in (a, b):
            self._make_train_data(root)
        flags = ["--batch-size", "8", "--model-nr", "s2_556_",
                 "--augment", "--seed", "3", "--lr", "5e-4"]
        rc = train_cli.main(["--path", str(a) + "/", "--epochs", "4"] + flags)
        assert rc == 0
        rc = train_cli.main(["--path", str(b) + "/", "--epochs", "2"] + flags)
        assert rc == 0
        state_dir = b / "network_data" / "s2_556_state"
        # Resume names ONLY the state dir: everything else must be adopted.
        rc = train_cli.main(
            ["--path", str(b) + "/", "--epochs", "4", "--resume", str(state_dir)]
        )
        assert rc == 0
        wa = np.load(a / "network_data" / "s2_556_lr_5e-04.npz")
        wb = np.load(b / "network_data" / "s2_556_lr_5e-04.npz")
        for k in wa.files:
            np.testing.assert_allclose(wb[k], wa[k], rtol=1e-5, atol=1e-7)

    def test_cli_resume_explicit_flag_wins(self, tmp_path, capsys):
        """An explicit flag on resume wins over the checkpointed value and
        prints a divergence warning — even when it equals the fresh-run
        default (--seed 0) or is the negative boolean (--no-augment)."""
        self._make_train_data(tmp_path)
        rc = train_cli.main(
            ["--path", str(tmp_path) + "/", "--epochs", "2", "--batch-size",
             "8", "--model-nr", "s2_558_", "--seed", "3", "--augment"]
        )
        assert rc == 0
        state_dir = tmp_path / "network_data" / "s2_558_state"
        rc = train_cli.main(
            ["--path", str(tmp_path) + "/", "--epochs", "3",
             "--resume", str(state_dir), "--seed", "0", "--no-augment"]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert out.count("overrides the checkpointed") == 2  # seed + augment

    def test_cli_resume_explicit_lr_drives_updates(self, tmp_path, capsys):
        """An explicit --lr on a full-state resume must actually train at
        that lr (the restored opt_state/plateau carry the checkpointed lr
        and would otherwise silently win while checkpoints get written
        under the new-lr filenames)."""
        self._make_train_data(tmp_path)
        rc = train_cli.main(
            ["--path", str(tmp_path) + "/", "--epochs", "2", "--batch-size",
             "8", "--model-nr", "s2_559_"]
        )
        assert rc == 0
        state_dir = tmp_path / "network_data" / "s2_559_state"
        rc = train_cli.main(
            ["--path", str(tmp_path) + "/", "--epochs", "3",
             "--resume", str(state_dir), "--lr", "5e-2"]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "overrides the checkpointed" in out
        # the resumed epoch's log line must show the override, not 1e-4
        assert "lr 5.0e-02" in out
        assert (tmp_path / "network_data" / "s2_559_lr_5e-02.npz").exists()

    def test_cli_stream_end_to_end(self, tmp_path):
        """--stream drives fit via StreamingPatchDataset through main(),
        sharing the run seed, and produces checkpoints."""
        self._make_train_data(tmp_path)
        rc = train_cli.main(
            ["--path", str(tmp_path) + "/", "--epochs", "2", "--stream",
             "--batch-size", "8", "--model-nr", "s2_557_", "--seed", "5"]
        )
        assert rc == 0
        out = tmp_path / "network_data"
        assert (out / "s2_557_lr_1e-04.npz").exists()
        assert (out / "s2_557_state").is_dir()


class TestDemoCLI:
    def test_gt_scene_branch(self, tmp_path):
        """A synthetic GT-bearing .mat scene exercises the pre-simulated
        branch (reference demo style)."""
        import h5py

        rng = np.random.default_rng(1)
        h = 120
        with h5py.File(tmp_path / "S2X_TEST_T00XXX.mat", "w") as f:
            # stored channel-first like MATLAB v7.3 scenes
            f["im10"] = (rng.random((4, h, h)) * 8000).astype(np.float32)
            f["im20"] = (rng.random((6, h // 2, h // 2)) * 8000).astype(np.float32)
            f["imGT"] = (rng.random((6, h, h)) * 8000).astype(np.float32)
        res = demo_cli.run_scene(
            str(tmp_path / "S2X_TEST_T00XXX.mat"), deep=False, plots=False,
            out_dir=str(tmp_path),
        )
        assert "rmse_dsen2_20" in res and "rmse_bicubic_20" in res
        assert np.isfinite(res["rmse_dsen2_20"])


class TestS2SupresParser:
    def test_reference_flags_present(self):
        p = build_parser()
        args = p.parse_args(
            [
                "in.xml", "out.tif", "--roi_x_y", "0,0,100,100", "--run_60",
                "--select_UTM", "UTM 33N", "--output_file_format", "ENVI",
                "--copy_original_bands", "--save_prefix", "res/",
            ]
        )
        assert args.run_60 and args.copy_original_bands
        assert args.output_file_format == "ENVI"

    def test_gtiff_without_gdal_uses_builtin_writer(self, tmp_path, rng):
        """No GDAL in this image: GTiff requests produce a real GeoTIFF via
        the pure-Python writer (round 5), not an npz."""
        from dsen2_tpu.io.writers import write_bands
        from tiff_reader import read_tiff

        bands = [("SR B5 (705 nm)", rng.random((10, 10)).astype(np.float64))]
        out = str(tmp_path / "out.tif")
        fmt = write_bands(out, bands, "GTiff")
        assert fmt in ("GTiff", "BigTIFF")
        got = read_tiff(out)
        np.testing.assert_array_equal(got["bands"]["SR B5 (705 nm)"],
                                      bands[0][1])

    def test_npz_fallback_writer(self, tmp_path, rng):
        from dsen2_tpu.io.writers import write_bands

        bands = [("SR B5 (705 nm)", rng.random((10, 10)).astype(np.float64))]
        out = str(tmp_path / "out.img")
        fmt = write_bands(out, bands, "HFA")  # non-GTiff, no GDAL -> npz
        assert fmt == "npz"
        z = np.load(out + ".npz" if os.path.exists(out + ".npz") else out, allow_pickle=True)
        assert "bands" in z


class TestConvertWeightsCLI:
    def test_roundtrip(self, tmp_path):
        from dsen2_tpu.cli.convert_weights import main as convert
        from dsen2_tpu.core.config import ModelConfig, dsen2_2x
        from dsen2_tpu.models import s2net
        from dsen2_tpu.weights import load_keras_weights, save_keras_weights

        params = s2net.init_params(jax.random.PRNGKey(2), dsen2_2x(False))
        src = str(tmp_path / "w.hdf5")
        save_keras_weights(src, jax.tree_util.tree_map(np.asarray, params))
        npz = str(tmp_path / "w.npz")
        assert convert([src, npz]) == 0
        back = str(tmp_path / "w2.hdf5")
        assert convert([npz, back]) == 0
        loaded = load_keras_weights(back, dsen2_2x(False))
        np.testing.assert_array_equal(
            np.asarray(params["tail"]["w"]), loaded["tail"]["w"]
        )


class TestProfilingUtils:
    def test_timer_and_block_and_time(self, capsys):
        import jax.numpy as jnp

        from dsen2_tpu.utils.profiling import Timer, block_and_time

        with Timer("t") as t:
            pass
        assert t.elapsed >= 0
        assert "Elapsed time:" in capsys.readouterr().out

        f = jax.jit(lambda x: x * 2)
        out, secs = block_and_time(f, jnp.ones((8, 8)), repeats=2)
        assert secs > 0 and np.asarray(out)[0, 0] == 2.0

    def test_trace_writes_profile(self, tmp_path):
        import jax.numpy as jnp

        from dsen2_tpu.utils.profiling import annotate, trace

        with trace(str(tmp_path)):
            with annotate("region"):
                float(jnp.sum(jnp.ones((16, 16))))
        import glob

        profile_files = [
            p
            for p in glob.glob(str(tmp_path / "**" / "*"), recursive=True)
            if os.path.isfile(p) and os.path.getsize(p) > 0
        ]
        assert profile_files, "jax.profiler trace produced no profile data"


class TestMatRun60:
    def test_mat_scene_run60_crops_to_grid(self, tmp_path):
        """--run_60 on the bundled .mat scene must crop to a 36-multiple
        before the x6 Wald downsample (was a crash)."""
        scene = "/root/reference/data/S2A_MSIL1C_20170527_T33UUB.mat"
        if not os.path.exists(scene):
            pytest.skip("bundled scene unavailable")
        rc = cp_cli.main(
            [scene, "--run_60", "--save_prefix", str(tmp_path) + "/", "--seed", "0"]
        )
        assert rc == 0
        tile = os.listdir(tmp_path / "train60")[0]
        a = np.load(tmp_path / "train60" / tile / "data60_gt.npy")
        assert a.shape[0] == 500 and np.isfinite(a).all()


class TestNonSquareRoiPredict:
    def test_predict_orientation(self, tmp_path):
        """Non-square ROI: the recomposed prediction must be (H, W), not
        transposed (fixes the reference's x/y conflation)."""
        rng_l = np.random.default_rng(3)
        d10 = (rng_l.random((288, 432, 4)) * 8000).astype(np.float32)
        d20 = (rng_l.random((144, 216, 6)) * 8000).astype(np.float32)
        from dsen2_tpu.data.patches_dataset import save_test_patches

        out = tmp_path / "test" / "T_RECT.SAFE"
        save_test_patches(d10, d20, str(out))
        with open(out / "roi.json", "w") as f:
            # [xmin, ymin, xmax+1, ymax+1] on the 20m-of-sim grid: W=432 H=288
            json.dump([0, 0, 432, 288], f)

        from dsen2_tpu.core.config import dsen2_2x
        from dsen2_tpu.models import s2net
        from dsen2_tpu.weights import save_keras_weights

        params = s2net.init_params(jax.random.PRNGKey(0), dsen2_2x(False))
        wpath = str(tmp_path / "s2_032_lr_1e-04.hdf5")
        save_keras_weights(wpath, jax.tree_util.tree_map(np.asarray, params))
        rc = train_cli.main(["--predict", wpath, "--path", str(tmp_path) + "/"])
        assert rc == 0
        pred = np.load(out / [f for f in os.listdir(out) if f.endswith("-predict.npy")][0])
        assert pred.shape == (288, 432, 6)
