"""End-to-end inference parity: the fused jitted pipeline (extract ->
upsample -> CNN -> mosaic) vs the step-by-step numpy-oracle pipeline that
pins the reference semantics (testing/supres.py:15-50)."""

import numpy as np
import pytest

import jax

from dsen2_tpu.core.bands import SCALE
from dsen2_tpu.core.config import InferConfig, ModelConfig
from dsen2_tpu.infer.api import _run
from dsen2_tpu.models import s2net
from dsen2_tpu.refimpl.model_np import apply_np
from dsen2_tpu.refimpl.patches_np import (
    get_test_patches60_np,
    get_test_patches_np,
    recompose_images_np,
)


def _oracle_sr_2x(params_np, d10, d20, patch_size, border, residual_scale=0.1):
    """Reference pipeline, step by step in numpy (testing/supres.py:15-30)."""
    p10, p20 = get_test_patches_np(d10, d20, patch_size=patch_size, border=border)
    p10 = p10 / np.float32(SCALE)
    p20 = p20 / np.float32(SCALE)
    preds = np.stack(
        [apply_np(params_np, (p10[i], p20[i]), residual_scale) for i in range(p10.shape[0])]
    ).astype(np.float32)
    return recompose_images_np(preds, border, d10.shape[:2]) * np.float32(SCALE)


def _oracle_sr_6x(params_np, d10, d20, d60, patch_size, border, residual_scale=0.1):
    p10, p20, p60 = get_test_patches60_np(d10, d20, d60, patch_size=patch_size, border=border)
    p10, p20, p60 = (p / np.float32(SCALE) for p in (p10, p20, p60))
    preds = np.stack(
        [
            apply_np(params_np, (p10[i], p20[i], p60[i]), residual_scale)
            for i in range(p10.shape[0])
        ]
    ).astype(np.float32)
    return recompose_images_np(preds, border, d10.shape[:2]) * np.float32(SCALE)


@pytest.fixture(scope="module")
def tiny_cfg_2x():
    return ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=16)


@pytest.fixture(scope="module")
def tiny_cfg_6x():
    return ModelConfig(in_channels=(4, 6, 2), num_layers=2, feature_size=16)


class TestPipelineParity2x:
    def test_small_scene(self, rng, tiny_cfg_2x):
        d10 = (rng.random((120, 108, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((60, 54, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(7), tiny_cfg_2x)
        params_np = jax.tree_util.tree_map(np.asarray, params)

        infer_cfg = InferConfig(patch_size=64, border=8, batch_size=4)
        got = _run([d10, d20], 2, tiny_cfg_2x, params, infer_cfg)
        want = _oracle_sr_2x(params_np, d10, d20, patch_size=64, border=8)
        assert got.shape == (120, 108, 6)
        # f32 conv + mosaic vs f64 oracle: values are O(8000)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=0.5)

    def test_uneven_batch_padding(self, rng, tiny_cfg_2x):
        """Patch count not divisible by batch: padded duplicate patches must
        not corrupt the mosaic."""
        d10 = (rng.random((96, 96, 4)) * 5000).astype(np.float32)
        d20 = (rng.random((48, 48, 6)) * 5000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(8), tiny_cfg_2x)
        infer_cfg_a = InferConfig(patch_size=64, border=8, batch_size=3)
        infer_cfg_b = InferConfig(patch_size=64, border=8, batch_size=4)
        a = _run([d10, d20], 2, tiny_cfg_2x, params, infer_cfg_a)
        b = _run([d10, d20], 2, tiny_cfg_2x, params, infer_cfg_b)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=0.01)


class TestPipelineParity6x:
    def test_small_scene(self, rng, tiny_cfg_6x):
        d10 = (rng.random((144, 144, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((72, 72, 6)) * 8000).astype(np.float32)
        d60 = (rng.random((24, 24, 2)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(9), tiny_cfg_6x)
        params_np = jax.tree_util.tree_map(np.asarray, params)

        infer_cfg = InferConfig(patch_size=96, border=6, batch_size=4)
        got = _run([d10, d20, d60], 6, tiny_cfg_6x, params, infer_cfg)
        want = _oracle_sr_6x(params_np, d10, d20, d60, patch_size=96, border=6)
        assert got.shape == (144, 144, 2)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=0.5)


class TestDemoScene:
    def test_bundled_scene_runs(self, demo_scene_path, tiny_cfg_2x):
        """Smoke: the bundled Malmö scene (600x600) runs through the public
        API shape contract with a tiny model."""
        from dsen2_tpu.data.mat import read_scene
        from dsen2_tpu.infer.api import _run as run

        scene = read_scene(demo_scene_path)
        d10, d20 = scene["im10"], scene["im20"]
        assert d10.shape == (600, 600, 4) and d20.shape == (300, 300, 6)
        params = s2net.init_params(jax.random.PRNGKey(0), tiny_cfg_2x)
        out = run(
            [d10, d20], 2, tiny_cfg_2x, params, InferConfig(patch_size=128, border=8, batch_size=8)
        )
        assert out.shape == (600, 600, 6)
        assert np.isfinite(out).all()


class TestBandedEngine:
    def test_matches_one_shot(self, rng, tiny_cfg_2x):
        """The banded streaming engine must produce the identical mosaic."""
        from dsen2_tpu.infer.engine import sr_banded

        d10 = (rng.random((160, 120, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((80, 60, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(4), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")
        want = _run([d10, d20], 2, tiny_cfg_2x, params, icfg)
        for rows in (1, 2, 3, 100):
            got = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg, rows_per_band=rows)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)

    def test_device_output_bands_reassemble(self, rng, tiny_cfg_2x):
        """device_output=True returns (band, y0, h) device arrays that
        reassemble to exactly the host-path mosaic."""
        from dsen2_tpu.infer.engine import sr_banded

        d10 = (rng.random((160, 96, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((80, 48, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(21), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")
        want = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg, rows_per_band=2)
        bands = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg,
                          rows_per_band=2, device_output=True)
        out = np.full_like(want, np.nan)
        for b, y0, bh in bands:
            out[y0 : y0 + bh] = np.asarray(b)
        np.testing.assert_array_equal(out, want)

    def test_device_output_is_lazy_generator(self, tiny_cfg_2x, monkeypatch):
        """device_output=True must dispatch bands AS CONSUMED (at most one
        band ahead), not materialize the full mosaic up front — that is the
        bounded-HBM contract."""
        from dsen2_tpu.infer import engine

        calls = []
        orig = engine.sr_pipeline

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(engine, "sr_pipeline", spy)
        # local generator: the shared session rng's stream position must not
        # depend on whether this test runs (later tests assert thresholds
        # on data drawn from it)
        rng = np.random.default_rng(820)
        d10 = (rng.random((160, 96, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((80, 48, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(22), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")
        bands = engine.sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg,
                                 rows_per_band=1, device_output=True)
        assert calls == []  # nothing dispatched before consumption
        first = next(bands)
        assert len(calls) == 2  # band 0 + the prefetched band 1, no more
        rest = list(bands)
        total = len(calls)
        assert len(rest) + 1 == total  # one pipeline call per band overall
        assert first[1] == 0  # first band starts at row 0

    @pytest.mark.parametrize("lr_factor", [2, 6])
    def test_warm_cache_jobs_cover_engine_programs(self, tiny_cfg_2x,
                                                   tiny_cfg_6x, monkeypatch,
                                                   lr_factor):
        """scripts/warm_cache.py primes the compile cache by mirroring the
        banded engine's program shapes; if its derivation drifts, priming
        silently turns into cache misses. Assert the program keys sr_banded
        actually executes — including the round-5 streaming-window
        (pad_inputs=False) programs, whose window HEIGHTS key the HLO —
        are a subset of the jobs warm_one compiles for the same geometry,
        for both the 2x and the 3-raster 6x pipelines."""
        import importlib.util
        import os

        from dsen2_tpu.infer import api, engine

        spec = importlib.util.spec_from_file_location(
            "warm_cache",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "scripts", "warm_cache.py"),
        )
        wc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(wc)

        rng = np.random.default_rng(836)  # local: keep the shared stream stable
        size, rows = 192, 2
        if lr_factor == 2:
            cfg = tiny_cfg_2x
            icfg = InferConfig(patch_size=32, border=4, batch_size=4,
                               precision="highest")
            rasters = [
                (rng.random((size, size, 4)) * 8000).astype(np.uint16),
                (rng.random((size // 2, size // 2, 6)) * 8000).astype(np.uint16),
            ]
        else:
            cfg = tiny_cfg_6x
            icfg = InferConfig(patch_size=24, border=6, batch_size=4,
                               precision="highest")
            rasters = [
                (rng.random((size, size, 4)) * 8000).astype(np.uint16),
                (rng.random((size // 2, size // 2, 6)) * 8000).astype(np.uint16),
                (rng.random((size // 6, size // 6, 2)) * 8000).astype(np.uint16),
            ]

        engine_keys = set()
        orig = engine.sr_pipeline

        def spy(params, inputs, starts, positions, **kw):
            engine_keys.add((
                tuple(starts.shape), tuple(positions.shape), kw["out_hw"],
                tuple(i.dtype.name for i in inputs),
                tuple(tuple(i.shape) for i in inputs),
                kw.get("pad_inputs", True),
            ))
            return orig(params, inputs, starts, positions, **kw)

        monkeypatch.setattr(engine, "sr_pipeline", spy)
        params = s2net.init_params(jax.random.PRNGKey(30), cfg)
        engine.sr_banded(rasters, lr_factor, cfg, params, icfg,
                         rows_per_band=rows)

        warm_keys = set()

        class Recorder:
            def lower(self, params, inputs, starts, positions, **kw):
                warm_keys.add((
                    tuple(starts.shape), tuple(positions.shape), kw["out_hw"],
                    tuple(jax.numpy.dtype(i.dtype).name for i in inputs),
                    tuple(tuple(i.shape) for i in inputs),
                    kw.get("pad_inputs", True),
                ))
                return self

            def compile(self):
                return None

        monkeypatch.setattr(api, "sr_pipeline", Recorder())
        wc.warm_one(lr_factor, cfg, icfg, size, rows, in_dtype="uint16")
        assert engine_keys, "engine spy recorded nothing"
        missing = engine_keys - warm_keys
        assert not missing, f"engine programs not covered by warm_cache: {missing}"

    def test_windowed_staging_matches_device_inputs(self, tiny_cfg_2x):
        """Host-array rasters stream per-band input WINDOWS (h2d overlapped
        with compute); device-array rasters take the whole-raster path. The
        two modes must be bit-identical — including at the image top/bottom
        where the window regenerates the symmetric halo, and at an
        edge-flush last row (152/24 does not divide)."""
        rng = np.random.default_rng(830)  # local: keep the shared stream stable
        from dsen2_tpu.infer.engine import sr_banded
        from dsen2_tpu.infer.api import stage_raster

        for h, w in ((160, 96), (152, 96)):
            d10 = (rng.random((h, w, 4)) * 8000).astype(np.float32)
            d20 = (rng.random((h // 2, w // 2, 6)) * 8000).astype(np.float32)
            params = s2net.init_params(jax.random.PRNGKey(31), tiny_cfg_2x)
            icfg = InferConfig(patch_size=32, border=4, batch_size=4,
                               precision="highest")
            windowed = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg,
                                 rows_per_band=2)
            whole = sr_banded([stage_raster(d10), stage_raster(d20)], 2,
                              tiny_cfg_2x, params, icfg, rows_per_band=2)
            np.testing.assert_array_equal(windowed, whole)

    def test_windowed_staging_uint16_matches(self, tiny_cfg_2x):
        """Compact uint16 staging composes with window streaming: windows
        ship as uint16 and cast on device, identical to the device-input
        whole-raster path on the same values."""
        rng = np.random.default_rng(831)  # local: keep the shared stream stable
        from dsen2_tpu.infer.engine import sr_banded
        from dsen2_tpu.infer.api import stage_raster

        d10 = (rng.random((160, 96, 4)) * 12000).astype(np.uint16)
        d20 = (rng.random((80, 48, 6)) * 12000).astype(np.uint16)
        params = s2net.init_params(jax.random.PRNGKey(32), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4,
                           precision="highest")
        windowed = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg,
                             rows_per_band=2)
        whole = sr_banded([stage_raster(d10), stage_raster(d20)], 2,
                          tiny_cfg_2x, params, icfg, rows_per_band=2)
        np.testing.assert_array_equal(windowed, whole)

    def test_windowed_staging_lookahead_zero(self, tiny_cfg_2x):
        """stage_lookahead=0 (pure just-in-time staging) must still be
        correct — the lookahead is a performance knob only."""
        rng = np.random.default_rng(832)  # local: keep the shared stream stable
        from dsen2_tpu.infer.engine import sr_banded

        d10 = (rng.random((160, 96, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((80, 48, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(33), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4,
                           precision="highest")
        want = _run([d10, d20], 2, tiny_cfg_2x, params, icfg)
        got = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg,
                        rows_per_band=2, stage_lookahead=0)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)

    def test_windowed_stager_exception_propagates(self, tiny_cfg_2x,
                                                  monkeypatch):
        """An error raised while building/staging a window on the worker
        thread must surface to the caller (not hang or be swallowed)."""
        from dsen2_tpu.infer import engine

        rng = np.random.default_rng(837)  # local: keep the shared stream stable
        d10 = (rng.random((160, 96, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((80, 48, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(34), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4,
                           precision="highest")

        calls = []

        def boom(raster, grid, w0, w1):
            calls.append(1)
            raise RuntimeError("staging failed")

        monkeypatch.setattr(engine, "_stage_window", boom)
        with pytest.raises(RuntimeError, match="staging failed"):
            engine.sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg,
                             rows_per_band=2)
        assert calls  # the stager actually ran on the worker

    def test_flush_row_merged(self, rng, tiny_cfg_2x):
        """Image height not divisible by the interior -> the edge-flush row
        must land in the last band with last-write-wins intact."""
        from dsen2_tpu.infer.engine import sr_banded

        d10 = (rng.random((152, 96, 4)) * 8000).astype(np.float32)  # 152/24: flush
        d20 = (rng.random((76, 48, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(5), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")
        want = _run([d10, d20], 2, tiny_cfg_2x, params, icfg)
        got = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg, rows_per_band=2)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)


class TestBf16Turbo:
    def test_bf16_compute_close_to_f32(self, rng, tiny_cfg_2x):
        d10 = (rng.random((96, 96, 4)) * 8000).astype(np.float32)
        d20 = (rng.random((48, 48, 6)) * 8000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(6), tiny_cfg_2x)
        f32 = _run([d10, d20], 2, tiny_cfg_2x, params,
                   InferConfig(patch_size=64, border=8, batch_size=4, precision="highest"))
        bf16 = _run([d10, d20], 2, tiny_cfg_2x, params,
                    InferConfig(patch_size=64, border=8, batch_size=4,
                                precision="default", compute_dtype="bfloat16"))
        assert bf16.dtype == np.float32
        # bf16 has ~3 decimal digits; values O(8000) -> expect O(tens) error
        rmse = float(np.sqrt(np.mean((bf16.astype(np.float64) - f32.astype(np.float64)) ** 2)))
        assert rmse < 80.0, rmse
        assert np.isfinite(bf16).all()


class TestCompactReadback:
    """InferConfig.output_dtype: compact device->host formats (uint16 /
    bfloat16) for the mosaic; f32 stays the parity default."""

    def _scene(self, rng):
        d10 = (rng.random((96, 96, 4)) * 12000).astype(np.float32)
        d20 = (rng.random((48, 48, 6)) * 12000).astype(np.float32)
        return d10, d20

    def test_uint16_equals_rounded_f32(self, rng, tiny_cfg_2x):
        d10, d20 = self._scene(rng)
        params = s2net.init_params(jax.random.PRNGKey(11), tiny_cfg_2x)
        base = InferConfig(patch_size=64, border=8, batch_size=4, precision="highest")
        f32 = _run([d10, d20], 2, tiny_cfg_2x, params, base)
        u16 = _run([d10, d20], 2, tiny_cfg_2x, params,
                   InferConfig(patch_size=64, border=8, batch_size=4,
                               precision="highest", output_dtype="uint16"))
        assert u16.dtype == np.uint16
        want = np.clip(np.round(f32), 0, 65535).astype(np.uint16)
        # identical f32 prefix, same round-half-even on device and host;
        # allow the odd half-ulp straddle at .5 boundaries
        mismatch = np.abs(u16.astype(np.int32) - want.astype(np.int32))
        assert mismatch.max() <= 1
        assert (mismatch != 0).mean() < 1e-3

    def test_bf16_output_dtype(self, rng, tiny_cfg_2x):
        import ml_dtypes

        d10, d20 = self._scene(rng)
        params = s2net.init_params(jax.random.PRNGKey(12), tiny_cfg_2x)
        f32 = _run([d10, d20], 2, tiny_cfg_2x, params,
                   InferConfig(patch_size=64, border=8, batch_size=4, precision="highest"))
        b16 = _run([d10, d20], 2, tiny_cfg_2x, params,
                   InferConfig(patch_size=64, border=8, batch_size=4,
                               precision="highest", output_dtype="bfloat16"))
        assert b16.dtype == ml_dtypes.bfloat16
        np.testing.assert_allclose(
            b16.astype(np.float32), f32, rtol=1e-2, atol=64.0
        )

    def test_banded_uint16_matches_one_shot(self, rng, tiny_cfg_2x):
        from dsen2_tpu.infer.engine import sr_banded

        d10 = (rng.random((160, 96, 4)) * 12000).astype(np.float32)
        d20 = (rng.random((80, 48, 6)) * 12000).astype(np.float32)
        params = s2net.init_params(jax.random.PRNGKey(13), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4,
                           precision="highest", output_dtype="uint16")
        want = _run([d10, d20], 2, tiny_cfg_2x, params, icfg)
        got = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg, rows_per_band=2)
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, want)

    def test_ensemble_respects_output_dtype(self, rng, tiny_cfg_2x):
        from dsen2_tpu.infer.api import _run_ensembled

        d10, d20 = self._scene(rng)
        params = s2net.init_params(jax.random.PRNGKey(14), tiny_cfg_2x)
        icfg = InferConfig(patch_size=64, border=8, batch_size=4,
                           precision="highest", output_dtype="uint16")
        out = _run_ensembled([d10, d20], 2, tiny_cfg_2x, params, icfg)
        assert out.dtype == np.uint16
        # Semantics: the 8 transforms accumulate in f32 on DEVICE and only
        # the final mean is quantized (one rounding, one d2h readback) —
        # no compounded per-transform quantization error.
        from dsen2_tpu.ops.dihedral import dihedral_np, inverse_code

        f32_icfg = InferConfig(patch_size=64, border=8, batch_size=4,
                               precision="highest")
        acc = np.zeros(out.shape, np.float64)
        for code in range(8):
            tr = [dihedral_np(r, code) for r in (d10, d20)]
            sr = _run(tr, 2, tiny_cfg_2x, params, f32_icfg)
            acc += dihedral_np(sr, inverse_code[code]).astype(np.float64)
        want = np.clip(np.round(acc / 8.0), 0, 65535)
        assert np.abs(out.astype(np.float64) - want).max() <= 1.0


class TestCompactInputStaging:
    """uint16 L1C inputs ship to the device UNCONVERTED (half the h2d
    bytes) and are cast to compute_dtype inside the jitted pipeline
    (infer.api.stage_raster): every path must be bit-identical to staging
    host-cast float32 copies of the same values."""

    def _scene_u16(self, rng):
        d10 = (rng.random((120, 108, 4)) * 12000).astype(np.uint16)
        d20 = (rng.random((60, 54, 6)) * 12000).astype(np.uint16)
        return d10, d20

    def test_stage_raster_dtype_rules(self):
        import jax.numpy as jnp

        from dsen2_tpu.infer.api import stage_raster

        u16 = np.arange(12, dtype=np.uint16).reshape(3, 4, 1)
        assert stage_raster(u16).dtype == jnp.uint16
        assert stage_raster(u16.astype(np.int16)).dtype == jnp.int16
        assert stage_raster(u16.astype(np.uint8)).dtype == jnp.uint8
        # f64 is NOT exact-in-f32: it converts on host
        assert stage_raster(u16.astype(np.float64)).dtype == jnp.float32
        assert stage_raster(u16.astype(np.float32)).dtype == jnp.float32
        # device arrays pass through untouched (no copy, no cast)
        dev = stage_raster(u16)
        assert stage_raster(dev) is dev

    def test_uint16_inputs_bit_identical_to_f32(self, rng, tiny_cfg_2x):
        d10, d20 = self._scene_u16(rng)
        params = s2net.init_params(jax.random.PRNGKey(21), tiny_cfg_2x)
        icfg = InferConfig(patch_size=64, border=8, batch_size=4, precision="highest")
        got = _run([d10, d20], 2, tiny_cfg_2x, params, icfg)
        want = _run([d10.astype(np.float32), d20.astype(np.float32)],
                    2, tiny_cfg_2x, params, icfg)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, want)

    def test_uint16_bf16_compute_bit_identical_to_f32_staging(self, tiny_cfg_2x):
        """With compute_dtype='bfloat16' the compact path casts uint16->bf16
        ON DEVICE instead of via host f32; u16->f32 is exact, so the two
        staging routes must still agree bit-for-bit."""
        rng = np.random.default_rng(833)  # local: keep the shared stream stable
        d10, d20 = self._scene_u16(rng)
        params = s2net.init_params(jax.random.PRNGKey(24), tiny_cfg_2x)
        icfg = InferConfig(patch_size=64, border=8, batch_size=4,
                           precision="default", compute_dtype="bfloat16")
        got = _run([d10, d20], 2, tiny_cfg_2x, params, icfg)
        want = _run([d10.astype(np.float32), d20.astype(np.float32)],
                    2, tiny_cfg_2x, params, icfg)
        np.testing.assert_array_equal(got, want)

    def test_banded_uint16_inputs_bit_identical(self, rng, tiny_cfg_2x):
        from dsen2_tpu.infer.engine import sr_banded

        d10 = (rng.random((160, 96, 4)) * 12000).astype(np.uint16)
        d20 = (rng.random((80, 48, 6)) * 12000).astype(np.uint16)
        params = s2net.init_params(jax.random.PRNGKey(22), tiny_cfg_2x)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")
        got = sr_banded([d10, d20], 2, tiny_cfg_2x, params, icfg, rows_per_band=2)
        want = sr_banded([d10.astype(np.float32), d20.astype(np.float32)],
                         2, tiny_cfg_2x, params, icfg, rows_per_band=2)
        np.testing.assert_array_equal(got, want)

    def test_ensemble_uint16_inputs_bit_identical(self, rng, tiny_cfg_2x):
        from dsen2_tpu.infer.api import _run_ensembled

        d10, d20 = self._scene_u16(rng)
        params = s2net.init_params(jax.random.PRNGKey(23), tiny_cfg_2x)
        icfg = InferConfig(patch_size=64, border=8, batch_size=4, precision="highest")
        got = _run_ensembled([d10, d20], 2, tiny_cfg_2x, params, icfg)
        want = _run_ensembled([d10.astype(np.float32), d20.astype(np.float32)],
                              2, tiny_cfg_2x, params, icfg)
        np.testing.assert_array_equal(got, want)


class TestMetrics:
    def test_per_band_and_global(self, rng):
        from dsen2_tpu.infer.metrics import (
            evaluation_table, per_band_rmse, per_band_sre, rmse, sre_db,
        )

        gt = (rng.random((20, 20, 3)) * 1000).astype(np.float32)
        sr = gt + 10.0
        np.testing.assert_allclose(per_band_rmse(sr, gt), [10, 10, 10], rtol=1e-6)
        assert abs(rmse(sr, gt) - 10.0) < 1e-6
        s = per_band_sre(sr, gt)
        assert s.shape == (3,) and (s > 0).all()
        assert abs(sre_db(sr, gt) - s.mean()) < 1e-9
        table = evaluation_table(sr, gt, gt + 20.0, ["B5", "B6", "B7"])
        assert "B6" in table and "ALL" in table

    def test_sam_ergas_uiq_identity(self, rng):
        """All three paper metrics hit their perfect score on sr == gt."""
        from dsen2_tpu.infer.metrics import ergas, sam_deg, uiq

        gt = (rng.random((24, 24, 3)) * 1000 + 50).astype(np.float32)
        assert sam_deg(gt, gt) < 1e-6
        assert ergas(gt, gt, 2) < 1e-9
        assert abs(uiq(gt, gt) - 1.0) < 1e-9

    def test_sam_scale_invariance(self, rng):
        """SAM measures spectral shape only: per-pixel rescaling of the
        spectra leaves it at zero, while a per-band distortion does not."""
        from dsen2_tpu.infer.metrics import sam_deg

        gt = (rng.random((16, 16, 4)) * 1000 + 50).astype(np.float64)
        gains = 1.0 + rng.random((16, 16, 1))
        assert sam_deg(gt * gains, gt) < 1e-5
        distorted = gt * np.array([1.0, 2.0, 0.5, 1.0])
        assert sam_deg(distorted, gt) > 1.0

    def test_ergas_hand_value(self):
        """One band, constant gt=100, constant error 10, scale 2:
        ERGAS = 100/2 * sqrt((10/100)^2) = 5."""
        from dsen2_tpu.infer.metrics import ergas

        gt = np.full((12, 12, 1), 100.0)
        assert abs(ergas(gt + 10.0, gt, 2) - 5.0) < 1e-9
        assert abs(ergas(gt + 10.0, gt, 6) - 5.0 / 3.0) < 1e-9

    def test_uiq_detects_distortion(self, rng):
        from dsen2_tpu.infer.metrics import uiq

        gt = (rng.random((32, 32, 2)) * 1000).astype(np.float64)
        noisy = gt + rng.normal(0, 200, gt.shape)
        q = uiq(noisy, gt)
        assert q < uiq(gt + 1e-3, gt)
        assert -1.0 <= q <= 1.0
        # mean-shift alone must cost luminance score
        assert uiq(gt + 300.0, gt) < 0.9

    def test_table_summary_row(self, rng):
        from dsen2_tpu.infer.metrics import evaluation_table

        gt = (rng.random((20, 20, 3)) * 1000).astype(np.float32)
        table = evaluation_table(gt + 10.0, gt, gt + 20.0, ["B5", "B6", "B7"], scale=2)
        assert "SAM" in table and "ERGAS" in table and "UIQ" in table
