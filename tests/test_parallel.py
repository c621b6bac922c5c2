"""Mesh/sharding tests on the 8-virtual-device CPU mesh: DP batch sharding,
TP feature sharding, sharded-vs-single numerical equivalence, and the driver
entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsen2_tpu.core.config import ModelConfig
from dsen2_tpu.models import s2net
from dsen2_tpu.parallel import (
    batch_sharding,
    make_eval_step,
    make_mesh,
    make_train_step,
    replicated,
    shard_params,
)
from dsen2_tpu.train.nadam import nadam_keras


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=16)


@pytest.fixture(scope="module")
def data(cfg):
    rng = np.random.default_rng(0)
    x10 = jnp.asarray(rng.random((16, 16, 16, 4), np.float32))
    x20 = jnp.asarray(rng.random((16, 16, 16, 6), np.float32))
    tgt = jnp.asarray(rng.random((16, 16, 16, 6), np.float32))
    return x10, x20, tgt


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh()
        assert m.shape["data"] == 8 and m.shape["model"] == 1
        m2 = make_mesh(data=4, model=2)
        assert m2.shape["data"] == 4 and m2.shape["model"] == 2
        m3 = make_mesh(data=2, model=1)
        assert m3.devices.size == 2

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(data=16, model=1)

    def test_batch_sharding_spec(self):
        m = make_mesh()
        s = batch_sharding(m, 4)
        assert s.spec[0] == "data"
        assert all(p is None for p in s.spec[1:])


class TestShardedTraining:
    def test_dp_step_matches_unsharded(self, cfg, data):
        x10, x20, tgt = data
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        opt = nadam_keras(1e-3)

        step_single = make_train_step(cfg, opt, mesh=None)
        p1, s1, m1 = step_single(params, opt.init(params), (x10, x20), tgt)

        mesh = make_mesh()
        params_r = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt.init(params), replicated(mesh))
        step_mesh = make_train_step(cfg, opt, mesh=mesh)
        x10s = jax.device_put(x10, batch_sharding(mesh, 4))
        x20s = jax.device_put(x20, batch_sharding(mesh, 4))
        tgts = jax.device_put(tgt, batch_sharding(mesh, 4))
        p8, s8, m8 = step_mesh(params_r, opt_state, (x10s, x20s), tgts)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    def test_tp_sharded_params_same_loss(self, cfg, data):
        """Feature-dim (model-parallel) sharding must not change the math."""
        x10, x20, tgt = data
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(data=4, model=2)
        params_tp = shard_params(params, mesh, model_parallel=True)
        ev = make_eval_step(cfg, mesh=mesh)
        got = ev(params_tp, (x10, x20), tgt)
        ev0 = make_eval_step(cfg, mesh=None)
        want = ev0(params, (x10, x20), tgt)
        np.testing.assert_allclose(float(got["loss"]), float(want["loss"]), rtol=1e-6)

    def test_shard_params_places_on_model_axis(self, cfg):
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(data=4, model=2)
        tp = shard_params(params, mesh, model_parallel=True)
        spec = tp["head"]["w"].sharding.spec
        assert spec[-1] == "model"


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 128, 128, 6)

    @pytest.mark.parametrize("n", [8, 4, 1])
    def test_dryrun_multichip(self, n):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(n)


class TestMultiTileInference:
    def test_sharded_tiles_match_single(self, rng):
        """Tile-DP shard_map inference must equal per-tile single-device
        runs (BASELINE config #5 capability)."""
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer.api import _run
        from dsen2_tpu.parallel.inference import sr_tiles_sharded

        cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=16)
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")

        n = 8
        d10s = (rng.random((n, 48, 48, 4)) * 5000).astype(np.float32)
        d20s = (rng.random((n, 24, 24, 6)) * 5000).astype(np.float32)

        mesh = make_mesh(data=8)
        got = sr_tiles_sharded(params, [d10s, d20s], 2, cfg, icfg, mesh)
        assert got.shape == (n, 48, 48, 6)
        for i in range(0, n, 3):
            want = _run([d10s[i], d20s[i]], 2, cfg, params, icfg)
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=0.02)

    def test_sharded_tiles_uint16_inputs_bit_identical(self, rng):
        """Compact staging on the fleet path: uint16 tile stacks ship
        unconverted and cast on device — same bits as f32 staging."""
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.parallel.inference import sr_tiles_sharded

        cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=16)
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")
        n = 8
        d10s = (rng.random((n, 48, 48, 4)) * 12000).astype(np.uint16)
        d20s = (rng.random((n, 24, 24, 6)) * 12000).astype(np.uint16)
        mesh = make_mesh(data=8)
        got = sr_tiles_sharded(params, [d10s, d20s], 2, cfg, icfg, mesh)
        want = sr_tiles_sharded(
            params, [d10s.astype(np.float32), d20s.astype(np.float32)],
            2, cfg, icfg, mesh)
        np.testing.assert_array_equal(got, want)

    def test_indivisible_batch_raises(self, rng):
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.parallel.inference import sr_tiles_sharded

        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        icfg = InferConfig(patch_size=32, border=4, batch_size=4)
        mesh = make_mesh(data=8)
        d10s = np.zeros((6, 48, 48, 4), np.float32)
        d20s = np.zeros((6, 24, 24, 6), np.float32)
        with pytest.raises(ValueError):
            sr_tiles_sharded(params, [d10s, d20s], 2, cfg, icfg, mesh)


class TestSingleTileSharded:
    """One tile's patch grid sharded over the mesh (VERDICT r1 item #2):
    8-way band decomposition must be bit-identical to single-device."""

    def _cfg(self):
        cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=16)
        params = s2net.init_params(jax.random.PRNGKey(3), cfg)
        from dsen2_tpu.core.config import InferConfig

        icfg = InferConfig(patch_size=32, border=4, batch_size=4, precision="highest")
        return cfg, params, icfg

    def test_plan_shard_bands(self):
        from dsen2_tpu.parallel.inference import plan_shard_bands

        # 9 rows, no flush (9*8 == 72): balanced 2,1,1,...
        assert plan_shard_bands(9, 8, 72, 8) == [
            (0, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (8, 9), ]
        # flush row (9*8 > 70) would land alone on a shard -> merged back
        # (the donor band goes empty; empty bands are skipped at assembly)
        bands = plan_shard_bands(9, 8, 70, 8)
        assert bands[-1] == (7, 9) and bands[-2] == (7, 7)
        assert bands[0] == (0, 2)
        # fewer rows than devices: trailing shards empty
        assert plan_shard_bands(2, 8, 16, 8)[:2] == [(0, 1), (1, 2)]
        assert all(r0 == r1 for r0, r1 in plan_shard_bands(2, 8, 16, 8)[2:])
        # single device gets everything
        assert plan_shard_bands(5, 8, 40, 1) == [(0, 5)]

    def test_sharded_tile_matches_single_2x(self, rng):
        from dsen2_tpu.infer.api import _run
        from dsen2_tpu.parallel.inference import sr_tile_sharded

        cfg, params, icfg = self._cfg()
        # 70x66 on the 10m grid: flush row AND flush column both exercised
        d10 = (rng.random((70, 66, 4)) * 5000).astype(np.float32)
        d20 = (rng.random((35, 33, 6)) * 5000).astype(np.float32)
        want = _run([d10, d20], 2, cfg, params, icfg)
        mesh = make_mesh(data=8)
        got = sr_tile_sharded(params, [d10, d20], 2, cfg, icfg, mesh)
        np.testing.assert_array_equal(got, want)

    def test_sharded_tile_matches_single_6x(self, rng):
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer.api import _run
        from dsen2_tpu.parallel.inference import sr_tile_sharded

        cfg = ModelConfig(in_channels=(4, 6, 2), num_layers=2, feature_size=16)
        params = s2net.init_params(jax.random.PRNGKey(5), cfg)
        icfg = InferConfig(patch_size=48, border=6, batch_size=4, precision="highest")
        d10 = (rng.random((144, 108, 4)) * 5000).astype(np.float32)
        d20 = (rng.random((72, 54, 6)) * 5000).astype(np.float32)
        d60 = (rng.random((24, 18, 2)) * 5000).astype(np.float32)
        mesh = make_mesh(data=8)
        got = sr_tile_sharded(params, [d10, d20, d60], 6, cfg, icfg, mesh)
        # per-shard rows force chunk batch 3: bit-equal to a batch-3 single
        # run; batch-4 differs only by XLA conv-tiling reduction order
        icfg3 = InferConfig(patch_size=48, border=6, batch_size=3, precision="highest")
        np.testing.assert_array_equal(got, _run([d10, d20, d60], 6, cfg, params, icfg3))
        want = _run([d10, d20, d60], 6, cfg, params, icfg)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.5)

    def test_sharded_tile_uint16_inputs_bit_identical(self, rng):
        """Compact staging on the mesh path: uint16 rasters pad + window
        on host unconverted, cast on device — same bits as f32 staging."""
        from dsen2_tpu.parallel.inference import sr_tile_sharded

        cfg, params, icfg = self._cfg()
        d10 = (rng.random((70, 66, 4)) * 12000).astype(np.uint16)
        d20 = (rng.random((35, 33, 6)) * 12000).astype(np.uint16)
        mesh = make_mesh(data=8)
        got = sr_tile_sharded(params, [d10, d20], 2, cfg, icfg, mesh)
        want = sr_tile_sharded(
            params, [d10.astype(np.float32), d20.astype(np.float32)],
            2, cfg, icfg, mesh)
        np.testing.assert_array_equal(got, want)

    def test_fewer_rows_than_devices(self, rng):
        from dsen2_tpu.infer.api import _run
        from dsen2_tpu.parallel.inference import sr_tile_sharded

        cfg, params, icfg = self._cfg()
        d10 = (rng.random((32, 96, 4)) * 5000).astype(np.float32)  # 1-2 grid rows
        d20 = (rng.random((16, 48, 6)) * 5000).astype(np.float32)
        want = _run([d10, d20], 2, cfg, params, icfg)
        mesh = make_mesh(data=8)
        got = sr_tile_sharded(params, [d10, d20], 2, cfg, icfg, mesh)
        np.testing.assert_array_equal(got, want)

    def test_empty_leading_band(self, rng):
        """ny==2 with a flush row: the edge-flush rebalance empties band 0
        ([(0,0),(0,2),...]) — idle shards must duplicate the first NON-empty
        band (a (0,0) fallback would negative-index the row schedule and
        inflate every shard's input window to the full raster)."""
        from dsen2_tpu.infer.api import _run
        from dsen2_tpu.parallel.inference import plan_shard_bands, sr_tile_sharded

        cfg, params, icfg = self._cfg()
        bands = plan_shard_bands(2, 24, 40, 8)  # interior 24, h10 40
        assert bands[0] == (0, 0) and bands[1] == (0, 2)
        d10 = (rng.random((40, 96, 4)) * 5000).astype(np.float32)
        d20 = (rng.random((20, 48, 6)) * 5000).astype(np.float32)
        want = _run([d10, d20], 2, cfg, params, icfg)
        mesh = make_mesh(data=8)
        got = sr_tile_sharded(params, [d10, d20], 2, cfg, icfg, mesh)
        np.testing.assert_array_equal(got, want)

    def test_api_mesh_kwarg(self, rng):
        from dsen2_tpu.infer.api import _run

        cfg, params, icfg = self._cfg()
        d10 = (rng.random((64, 64, 4)) * 5000).astype(np.float32)
        d20 = (rng.random((32, 32, 6)) * 5000).astype(np.float32)
        want = _run([d10, d20], 2, cfg, params, icfg)
        got = _run([d10, d20], 2, cfg, params, icfg, mesh=make_mesh(data=8))
        np.testing.assert_array_equal(got, want)

    def test_mesh_ensemble_device_resident_matches_single(self):
        """The mesh ensemble folds every shard's band into an on-device f32
        accumulator (one readback total) — it must agree with the
        single-device ensemble to f32 accumulation-order tolerance, on a
        square AND a non-square (odd rotations transpose the band
        decomposition) scene."""
        rng = np.random.default_rng(834)  # local: keep the shared stream stable
        from dsen2_tpu.infer.api import _run_ensembled

        cfg, params, icfg = self._cfg()
        mesh = make_mesh(data=8)
        for h, w in ((64, 64), (40, 96)):
            d10 = (rng.random((h, w, 4)) * 5000).astype(np.float32)
            d20 = (rng.random((h // 2, w // 2, 6)) * 5000).astype(np.float32)
            want = _run_ensembled([d10, d20], 2, cfg, params, icfg)
            got = _run_ensembled([d10, d20], 2, cfg, params, icfg, mesh=mesh)
            assert got.dtype == want.dtype
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.05)

    def test_mesh_ensemble_single_readback(self, monkeypatch):
        """The device-resident mesh ensemble must perform exactly 8 sharded
        calls with device_result=True and NO per-transform host mosaic
        assembly."""
        rng = np.random.default_rng(835)  # local: keep the shared stream stable
        from dsen2_tpu.infer.api import _run_ensembled
        from dsen2_tpu.parallel import inference as pinf

        cfg, params, icfg = self._cfg()
        mesh = make_mesh(data=8)
        calls = []
        orig = pinf.sr_tile_sharded

        def spy(*a, **kw):
            calls.append(kw.get("device_result", False))
            return orig(*a, **kw)

        monkeypatch.setattr(pinf, "sr_tile_sharded", spy)
        d10 = (rng.random((64, 64, 4)) * 5000).astype(np.float32)
        d20 = (rng.random((32, 32, 6)) * 5000).astype(np.float32)
        _run_ensembled([d10, d20], 2, cfg, params, icfg, mesh=mesh)
        assert calls == [True] * 8

    def test_mesh_with_device_output_raises(self, rng):
        """device_output=True promises a device-resident mosaic; the sharded
        path assembles on host, so the combination must be an explicit error
        rather than a silently-broken contract."""
        from dsen2_tpu.infer.api import _run

        cfg, params, icfg = self._cfg()
        d10 = (rng.random((64, 64, 4)) * 5000).astype(np.float32)
        d20 = (rng.random((32, 32, 6)) * 5000).astype(np.float32)
        with pytest.raises(ValueError, match="device_output"):
            _run([d10, d20], 2, cfg, params, icfg,
                 mesh=make_mesh(data=8), device_output=True)
