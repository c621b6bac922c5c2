"""Full train-state checkpoint/resume via orbax: params + Nadam moments +
epoch round-trip exactly, and a resumed run continues the same trajectory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsen2_tpu.core.config import ModelConfig
from dsen2_tpu.models import s2net
from dsen2_tpu.train.nadam import nadam_keras
from dsen2_tpu.weights.checkpoint import restore_train_state, save_train_state


def _tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestOrbaxRoundTrip:
    def test_state_roundtrip(self, tmp_path):
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
        opt = nadam_keras(1e-3)
        state = opt.init(params)
        # advance a few steps so moments are non-trivial
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        for _ in range(3):
            upd, state = opt.update(g, state)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)

        path = str(tmp_path / "ckpt")
        save_train_state(path, params, state, epoch=3, extra={"best": np.float32(0.5)})
        restored = restore_train_state(path)
        _tree_equal(restored["params"], params)
        _tree_equal(restored["opt_state"], state)
        assert int(restored["epoch"]) == 3
        assert float(restored["extra"]["best"]) == 0.5

    def test_resume_continues_trajectory(self, tmp_path):
        """Optimizer-state restore must reproduce the uninterrupted run
        exactly (the reference's --resume restarts moments; we don't)."""
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        params0 = s2net.init_params(jax.random.PRNGKey(1), cfg)
        opt = nadam_keras(1e-3)

        def grad_at(i, params):
            return jax.tree_util.tree_map(
                lambda p: jnp.cos(p * (i + 1)) * 0.1, params
            )

        # uninterrupted: 6 steps
        p, s = params0, opt.init(params0)
        for i in range(6):
            upd, s = opt.update(grad_at(i, p), s, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)

        # interrupted at 3 + resume
        p2, s2 = params0, opt.init(params0)
        for i in range(3):
            upd, s2 = opt.update(grad_at(i, p2), s2, p2)
            p2 = jax.tree_util.tree_map(lambda a, u: a + u, p2, upd)
        path = str(tmp_path / "mid")
        save_train_state(path, p2, s2, epoch=3)
        restored = restore_train_state(path, like={"params": p2, "opt_state": s2,
                                                   "epoch": np.asarray(3), "extra": {}})
        p3 = restored["params"]
        s3 = restored["opt_state"]
        if hasattr(s2, "_fields"):  # rebuild the NamedTuple structure
            s3 = type(s2)(*s3)
        for i in range(3, 6):
            upd, s3 = opt.update(grad_at(i, p3), s3, p3)
            p3 = jax.tree_util.tree_map(lambda a, u: a + u, p3, upd)

        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


class TestCrashSafety:
    """save_train_state must never destroy the previous checkpoint before the
    new one is fully written (the periodic save overwrites one dir in place)."""

    def _mini_state(self, key=0):
        cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=8)
        params = s2net.init_params(jax.random.PRNGKey(key), cfg)
        opt = nadam_keras(1e-3)
        return params, opt.init(params)

    def test_crash_during_write_keeps_previous(self, tmp_path):
        params, state = self._mini_state()
        path = str(tmp_path / "ckpt")
        save_train_state(path, params, state, epoch=3)

        import dsen2_tpu.weights.checkpoint as ckpt_mod

        class Boom(RuntimeError):
            pass

        class FailingCkpt:
            def save(self, *a, **k):
                raise Boom("disk died mid-save")

        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(ckpt_mod, "_checkpointer", lambda: FailingCkpt())
            with pytest.raises(Boom):
                save_train_state(path, params, state, epoch=7)
        restored = restore_train_state(path)
        assert int(restored["epoch"]) == 3  # previous state survived

    def test_second_save_replaces_and_cleans_up(self, tmp_path):
        import os

        params, state = self._mini_state()
        path = str(tmp_path / "ckpt")
        save_train_state(path, params, state, epoch=1)
        save_train_state(path, params, state, epoch=2)
        assert int(restore_train_state(path)["epoch"]) == 2
        assert not os.path.exists(path + ".tmp")
        assert not os.path.exists(path + ".old")

    def test_restore_falls_back_to_old(self, tmp_path):
        """A crash between the two swap renames leaves only ckpt.old."""
        import os

        params, state = self._mini_state()
        path = str(tmp_path / "ckpt")
        save_train_state(path, params, state, epoch=5)
        os.rename(path, path + ".old")
        assert int(restore_train_state(path)["epoch"]) == 5
