"""Model numerics: JAX s2net vs the float64 numpy oracle; param counts vs the
reference architecture; Keras-HDF5 weight round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsen2_tpu.core.config import ModelConfig, dsen2_2x, dsen2_6x
from dsen2_tpu.models import s2net
from dsen2_tpu.refimpl.model_np import apply_np


@pytest.fixture(scope="module")
def small_cfg():
    return ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=16)


class TestForward:
    def test_matches_numpy_oracle(self, rng, small_cfg):
        params = s2net.init_params(jax.random.PRNGKey(0), small_cfg)
        x10 = rng.standard_normal((1, 24, 24, 4)).astype(np.float32)
        x20 = rng.standard_normal((1, 24, 24, 6)).astype(np.float32)
        got = np.asarray(s2net.apply(params, (x10, x20), small_cfg))
        want = apply_np(jax.tree_util.tree_map(np.asarray, params), (x10[0], x20[0]))
        np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)

    def test_three_input_residual_uses_last(self, rng):
        """6x variant: global residual adds the upsampled 60m input
        (reference utils/DSen2Net.py:38)."""
        cfg = ModelConfig(in_channels=(4, 6, 2), num_layers=1, feature_size=8)
        params = s2net.init_params(jax.random.PRNGKey(1), cfg)
        xs = tuple(
            rng.standard_normal((2, 12, 12, c)).astype(np.float32) for c in (4, 6, 2)
        )
        got = np.asarray(s2net.apply(params, xs, cfg))
        want = np.stack(
            [apply_np(jax.tree_util.tree_map(np.asarray, params), tuple(x[i] for x in xs)) for i in range(2)]
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert got.shape == (2, 12, 12, 2)

    def test_remat_same_result(self, rng, small_cfg):
        params = s2net.init_params(jax.random.PRNGKey(0), small_cfg)
        xs = (
            rng.standard_normal((1, 16, 16, 4)).astype(np.float32),
            rng.standard_normal((1, 16, 16, 6)).astype(np.float32),
        )
        a = np.asarray(s2net.apply(params, xs, small_cfg, remat=False))
        b = np.asarray(s2net.apply(params, xs, small_cfg, remat=True))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


class TestParamCounts:
    """Counts computed from the reference architecture (SURVEY.md §2.1):
    DSen2 2x ~= 1.790M, VDSen2 ~= 37.8M."""

    def test_dsen2_2x(self):
        params = s2net.init_params(jax.random.PRNGKey(0), dsen2_2x(False))
        n = s2net.param_count(params)
        assert 1_750_000 < n < 1_840_000, n

    def test_vdsen2_2x(self):
        params = s2net.init_params(jax.random.PRNGKey(0), dsen2_2x(True))
        n = s2net.param_count(params)
        assert 37_000_000 < n < 38_500_000, n

    def test_dsen2_6x(self):
        params = s2net.init_params(jax.random.PRNGKey(0), dsen2_6x(False))
        n = s2net.param_count(params)
        assert 1_750_000 < n < 1_840_000, n


class TestHeUniform:
    def test_bounds_and_spread(self):
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=128)
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        w = np.asarray(params["blocks"]["w1"][0])
        limit = np.sqrt(6.0 / (3 * 3 * 128))
        assert np.all(np.abs(w) <= limit)
        assert np.abs(w).max() > 0.9 * limit
        assert params["head"]["b"].sum() == 0.0


class TestKerasRoundTrip:
    def test_save_load(self, tmp_path, small_cfg):
        from dsen2_tpu.weights import load_keras_weights, save_keras_weights

        params = s2net.init_params(jax.random.PRNGKey(3), small_cfg)
        path = str(tmp_path / "w.hdf5")
        save_keras_weights(path, jax.tree_util.tree_map(np.asarray, params))
        loaded = load_keras_weights(path, small_cfg)
        for top in ("head", "blocks", "tail"):
            for k in params[top]:
                np.testing.assert_array_equal(
                    np.asarray(params[top][k]), loaded[top][k]
                )
