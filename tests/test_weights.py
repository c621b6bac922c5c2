"""Weight registry resolution: env-var dir, models/ dir, fresh-init fallback
with warning; npz/hdf5 preference."""

import os
import warnings

import numpy as np
import pytest

import jax

from dsen2_tpu.core.config import dsen2_2x
from dsen2_tpu.models import s2net
from dsen2_tpu.weights import (
    default_params,
    load_params_npz,
    reference_weight_filename,
    save_keras_weights,
    save_params_npz,
)


@pytest.fixture(autouse=True)
def _clear_cache():
    import dsen2_tpu.weights as w

    w._cache.clear()
    yield
    w._cache.clear()


class TestResolutionOrder:
    def test_env_dir_wins(self, tmp_path, monkeypatch):
        cfg = dsen2_2x(False)
        params = s2net.init_params(jax.random.PRNGKey(42), cfg)
        fname = reference_weight_filename(False, False)
        save_keras_weights(
            str(tmp_path / fname), jax.tree_util.tree_map(np.asarray, params)
        )
        monkeypatch.setenv("DSEN2_TPU_WEIGHTS_DIR", str(tmp_path))
        got = default_params(cfg, run_60=False, deep=False)
        np.testing.assert_array_equal(
            np.asarray(got["head"]["w"]), np.asarray(params["head"]["w"])
        )

    def test_npz_fallback_in_env_dir(self, tmp_path, monkeypatch):
        cfg = dsen2_2x(False)
        params = s2net.init_params(jax.random.PRNGKey(7), cfg)
        fname = reference_weight_filename(False, False).replace(".hdf5", ".npz")
        save_params_npz(str(tmp_path / fname), jax.tree_util.tree_map(np.asarray, params))
        monkeypatch.setenv("DSEN2_TPU_WEIGHTS_DIR", str(tmp_path))
        got = default_params(cfg, run_60=False, deep=False)
        np.testing.assert_array_equal(
            np.asarray(got["tail"]["w"]), np.asarray(params["tail"]["w"])
        )

    def test_missing_weights_warn_and_init(self, tmp_path, monkeypatch):
        """Point everything at an empty dir: a deterministic init + warning.
        Uses the VDSen2_60 slot only if its file is absent from models/
        (it may exist); fake the search path instead."""
        import dsen2_tpu.weights as w

        monkeypatch.setenv("DSEN2_TPU_WEIGHTS_DIR", str(tmp_path))
        monkeypatch.setattr(w, "_search_dirs", lambda: [str(tmp_path)])
        cfg = dsen2_2x(False)
        with pytest.warns(UserWarning, match="UNTRAINED"):
            got = w.default_params(cfg, run_60=False, deep=False)
        want = s2net.init_params(jax.random.PRNGKey(0), cfg)
        np.testing.assert_array_equal(
            np.asarray(got["head"]["w"]), np.asarray(want["head"]["w"])
        )

    def test_cache_hit_same_object(self, tmp_path, monkeypatch):
        import dsen2_tpu.weights as w

        monkeypatch.setattr(w, "_search_dirs", lambda: [str(tmp_path)])
        cfg = dsen2_2x(False)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            a = w.default_params(cfg, run_60=False, deep=False)
            b = w.default_params(cfg, run_60=False, deep=False)
        assert a is b


class TestNpzRoundTrip:
    def test_roundtrip(self, tmp_path):
        cfg = dsen2_2x(False)
        params = jax.tree_util.tree_map(
            np.asarray, s2net.init_params(jax.random.PRNGKey(1), cfg)
        )
        path = str(tmp_path / "w.npz")
        save_params_npz(path, params)
        loaded = load_params_npz(path)
        for top in params:
            for k in params[top]:
                np.testing.assert_array_equal(params[top][k], loaded[top][k])


class TestEnvDirExclusive:
    def test_empty_env_dir_gives_fresh_init(self, tmp_path, monkeypatch):
        """DSEN2_TPU_WEIGHTS_DIR is an EXCLUSIVE override: an empty dir must
        NOT fall back to the shipped ./models/ weights (experiment drivers
        rely on 'empty dir -> untrained init')."""
        cfg = dsen2_2x(False)
        monkeypatch.setenv("DSEN2_TPU_WEIGHTS_DIR", str(tmp_path))
        with pytest.warns(UserWarning, match="UNTRAINED"):
            got = default_params(cfg, run_60=False, deep=False)
        want = s2net.init_params(jax.random.PRNGKey(0), cfg)
        np.testing.assert_array_equal(
            np.asarray(got["head"]["w"]), np.asarray(want["head"]["w"])
        )

    def test_cache_keys_on_env_dir(self, tmp_path, monkeypatch):
        """Evaluating several weight dirs in one process must not serve the
        first dir's weights for all of them (the generalization-study bug)."""
        cfg = dsen2_2x(False)
        fname = reference_weight_filename(False, False).replace(".hdf5", ".npz")
        dirs, saved = [], []
        for key in (11, 22):
            d = tmp_path / f"w{key}"
            d.mkdir()
            params = jax.tree_util.tree_map(
                np.asarray, s2net.init_params(jax.random.PRNGKey(key), cfg)
            )
            save_params_npz(str(d / fname), params)
            dirs.append(d)
            saved.append(params)

        got = []
        for d in dirs:
            monkeypatch.setenv("DSEN2_TPU_WEIGHTS_DIR", str(d))
            got.append(default_params(cfg, run_60=False, deep=False))
        for g, want in zip(got, saved):
            np.testing.assert_array_equal(
                np.asarray(g["head"]["w"]), np.asarray(want["head"]["w"])
            )
        assert not np.array_equal(
            np.asarray(got[0]["head"]["w"]), np.asarray(got[1]["head"]["w"])
        )

    def test_cache_keys_on_file_content(self, tmp_path, monkeypatch):
        """A dir that was empty at first call and gains weights later (e.g.
        an in-process training installing its result) must not keep serving
        the cached fresh init — the cache keys on the resolved file's
        identity, not the directory path."""
        cfg = dsen2_2x(False)
        monkeypatch.setenv("DSEN2_TPU_WEIGHTS_DIR", str(tmp_path))
        with pytest.warns(UserWarning, match="UNTRAINED"):
            first = default_params(cfg, run_60=False, deep=False)

        fname = reference_weight_filename(False, False).replace(".hdf5", ".npz")
        trained = jax.tree_util.tree_map(
            np.asarray, s2net.init_params(jax.random.PRNGKey(7), cfg)
        )
        save_params_npz(str(tmp_path / fname), trained)

        got = default_params(cfg, run_60=False, deep=False)
        np.testing.assert_array_equal(
            np.asarray(got["head"]["w"]), np.asarray(trained["head"]["w"])
        )
        assert not np.array_equal(
            np.asarray(got["head"]["w"]), np.asarray(first["head"]["w"])
        )
