"""Dihedral-group ops (ops/dihedral.py) and geometric self-ensembling
(infer/api.py::_run_ensembled). The transforms back the paper's
flip/rotation augmentation protocol and the inference-time ensemble; the
correctness risk is the group bookkeeping (inverse codes, numpy/jax twins),
so that is what is pinned here."""

import numpy as np
import pytest

import jax

from dsen2_tpu.ops.dihedral import dihedral, dihedral_batch, dihedral_np, inverse_code


@pytest.fixture()
def img(rng):
    # Deliberately non-square-symmetric content, non-square shape not
    # allowed for codes 1/3 round-trips through fixed-shape jax; use square.
    return (rng.random((6, 6, 3)) * 100).astype(np.float32)


class TestDihedralGroup:
    def test_all_codes_distinct(self, img):
        outs = [dihedral_np(img, c).tobytes() for c in range(8)]
        assert len(set(outs)) == 8

    def test_inverse_round_trip(self, img):
        for c in range(8):
            back = dihedral_np(dihedral_np(img, c), inverse_code[c])
            np.testing.assert_array_equal(back, img)

    def test_inverse_is_group_inverse_both_orders(self, img):
        for c in range(8):
            fwd_then_inv = dihedral_np(dihedral_np(img, c), inverse_code[c])
            inv_then_fwd = dihedral_np(dihedral_np(img, inverse_code[c]), c)
            np.testing.assert_array_equal(fwd_then_inv, img)
            np.testing.assert_array_equal(inv_then_fwd, img)

    def test_jax_matches_numpy(self, img):
        for c in range(8):
            got = np.asarray(dihedral(img, np.int32(c)))
            np.testing.assert_array_equal(got, dihedral_np(img, c))

    def test_batched(self, rng):
        batch = (rng.random((8, 4, 4, 2)) * 10).astype(np.float32)
        codes = np.arange(8, dtype=np.int32)
        got = np.asarray(dihedral_batch(batch, codes))
        for i in range(8):
            np.testing.assert_array_equal(got[i], dihedral_np(batch[i], i))

    def test_rectangular_round_trip(self, rng):
        # Odd rotations transpose H/W; the numpy twin must round-trip
        # rectangles too (full-raster ensembling sees non-square tiles).
        x = (rng.random((4, 10, 2)) * 10).astype(np.float32)
        for c in range(8):
            back = dihedral_np(dihedral_np(x, c), inverse_code[c])
            np.testing.assert_array_equal(back, x)


class TestSelfEnsemble:
    def test_equivariant_model_is_fixed_point(self, rng, monkeypatch):
        """With an exactly D4-equivariant 'network' (nearest-neighbour 2x
        upsample of the LR raster), averaging over the 8 transforms must
        reproduce the plain output bit-for-bit — this pins the
        transform/inverse bookkeeping of _run_ensembled."""
        from dsen2_tpu.infer import api

        def fake_run(rasters, lr_factor, cfg, params, infer_cfg, mesh=None,
                     device_output=False):
            lr = np.asarray(rasters[-1])
            return np.kron(lr, np.ones((lr_factor, lr_factor, 1))).astype(np.float32)

        monkeypatch.setattr(api, "_run", fake_run)
        d10 = (rng.random((12, 20, 4)) * 100).astype(np.float32)
        d20 = (rng.random((6, 10, 6)) * 100).astype(np.float32)
        got = api._run_ensembled([d10, d20], 2, None, None, None)
        np.testing.assert_allclose(
            got, fake_run([d10, d20], 2, None, None, None), rtol=0, atol=1e-4
        )

    def test_api_ensemble_rectangular_scene(self, tiny_params_2x):
        """Non-square tiles: the odd rotations run a transposed geometry on
        device and the inverse transforms must land every pixel back —
        checked against the host-transform oracle."""
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer.api import dsen2_20
        from dsen2_tpu.ops.dihedral import dihedral_np as d_np

        cfg, params = tiny_params_2x
        icfg = InferConfig(patch_size=32, border=4, batch_size=8)
        # local generator: keep the shared session rng's stream position
        # independent of this test's presence
        rng = np.random.default_rng(821)
        d10 = (rng.random((48, 96, 4)) * 2000).astype(np.float32)
        d20 = (rng.random((24, 48, 6)) * 2000).astype(np.float32)
        got = dsen2_20(d10, d20, params=params, infer_cfg=icfg, ensemble=True)
        assert got.shape == (48, 96, 6)
        acc = np.zeros((48, 96, 6), np.float64)
        for c in range(8):
            sr = dsen2_20(d_np(d10, c), d_np(d20, c), params=params, infer_cfg=icfg)
            acc += d_np(sr, inverse_code[c]).astype(np.float64)
        np.testing.assert_allclose(got, (acc / 8).astype(np.float32), rtol=0, atol=0.05)

    def test_ensemble_routes_banded_for_large_tiles(self, tiny_params_2x,
                                                    monkeypatch):
        """Tiles over the banded threshold must run each transform through
        the banded engine's per-band programs (same tame-warmup rationale
        as bench.py), with an identical result."""
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer import api, engine
        from dsen2_tpu.infer.api import dsen2_20

        cfg, params = tiny_params_2x
        icfg = InferConfig(patch_size=32, border=4, batch_size=8)
        rng = np.random.default_rng(822)
        d10 = (rng.random((48, 48, 4)) * 2000).astype(np.float32)
        d20 = (rng.random((24, 24, 6)) * 2000).astype(np.float32)
        want = dsen2_20(d10, d20, params=params, infer_cfg=icfg, ensemble=True)

        calls = []
        orig = engine.sr_banded

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(engine, "sr_banded", spy)
        monkeypatch.setattr(api, "_BANDED_THRESHOLD_PX", 1)
        got = dsen2_20(d10, d20, params=params, infer_cfg=icfg, ensemble=True)
        assert len(calls) == 8  # every transform took the banded path
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)

    def test_banded_ensemble_accumulate_nonsquare_flush(self, tiny_params_2x,
                                                        monkeypatch):
        """The per-band accumulator (_ens_accumulate_bands) folds each band
        of a TRANSFORMED mosaic into output space as a row- or
        column-stripe. Non-square tiles exercise the transposed geometries
        (odd rotations land column stripes) and 152 rows force an
        edge-flush band; the result must match the small-tile path that
        inverse-transforms whole mosaics."""
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer import api
        from dsen2_tpu.infer.api import dsen2_20

        cfg, params = tiny_params_2x
        icfg = InferConfig(patch_size=32, border=4, batch_size=8)
        rng = np.random.default_rng(823)
        # 452 rows: 18 stride-24 grid rows + an edge-flush row -> TWO bands
        # (default rows_per_band=16) with a flush-merged last band; 432
        # cols: 18 exact rows on the transposed (odd-rotation) geometry ->
        # two COLUMN stripes with nonzero offsets.
        d10 = (rng.random((452, 432, 4)) * 2000).astype(np.float32)
        d20 = (rng.random((226, 216, 6)) * 2000).astype(np.float32)
        want = dsen2_20(d10, d20, params=params, infer_cfg=icfg, ensemble=True)
        monkeypatch.setattr(api, "_BANDED_THRESHOLD_PX", 1)
        got = dsen2_20(d10, d20, params=params, infer_cfg=icfg, ensemble=True)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)

    def test_banded_ensemble_never_materializes_full_mosaic(
            self, tiny_params_2x, monkeypatch):
        """Bounded-HBM contract: over the banded threshold, no per-transform
        full mosaic may exist — every sr_pipeline output must be a band
        strictly shorter than the image (plus the f32 accumulator)."""
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer import api, engine
        from dsen2_tpu.infer.api import dsen2_20

        cfg, params = tiny_params_2x
        icfg = InferConfig(patch_size=32, border=4, batch_size=8)
        rng = np.random.default_rng(824)
        h = 432  # 18 grid rows -> two bands at rows_per_band=16
        d10 = (rng.random((h, h, 4)) * 2000).astype(np.float32)
        d20 = (rng.random((h // 2, h // 2, 6)) * 2000).astype(np.float32)

        shapes = []
        orig = engine.sr_pipeline

        def spy(params, inputs, starts, positions, **kw):
            out = orig(params, inputs, starts, positions, **kw)
            shapes.append(tuple(out.shape))
            return out

        monkeypatch.setattr(engine, "sr_pipeline", spy)
        monkeypatch.setattr(api, "_BANDED_THRESHOLD_PX", 1)
        monkeypatch.setattr(engine, "_BANDED_THRESHOLD_PX", 1, raising=False)
        dsen2_20(d10, d20, params=params, infer_cfg=icfg, ensemble=True)
        assert shapes, "banded pipeline never ran"
        assert all(s[0] < h for s in shapes), (
            f"a full-height mosaic was materialized: {shapes}"
        )

    def test_api_ensemble_runs_and_averages(self, rng, tiny_params_2x):
        """dsen2_20(ensemble=True) returns the mean of the 8 inverse-mapped
        predictions (checked against a manual loop over the public API)."""
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer.api import dsen2_20
        from dsen2_tpu.ops.dihedral import dihedral_np as d_np

        cfg, params = tiny_params_2x
        icfg = InferConfig(patch_size=32, border=4, batch_size=8)
        d10 = (rng.random((48, 48, 4)) * 2000).astype(np.float32)
        d20 = (rng.random((24, 24, 6)) * 2000).astype(np.float32)

        got = dsen2_20(d10, d20, params=params, infer_cfg=icfg, ensemble=True)
        acc = np.zeros((48, 48, 6), np.float64)
        for c in range(8):
            sr = dsen2_20(d_np(d10, c), d_np(d20, c), params=params, infer_cfg=icfg)
            acc += d_np(sr, inverse_code[c]).astype(np.float64)
        # The ensemble accumulates in f32 ON DEVICE (one readback); allow the
        # f32-summation rounding vs this f64 host oracle (values ~2000).
        np.testing.assert_allclose(got, (acc / 8).astype(np.float32), rtol=0, atol=0.05)
        assert got.dtype == np.float32 and np.isfinite(got).all()


@pytest.fixture(scope="module")
def tiny_params_2x():
    from dsen2_tpu.core.config import ModelConfig
    from dsen2_tpu.models import s2net

    cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=16)
    return cfg, s2net.init_params(jax.random.PRNGKey(3), cfg)
