"""Pallas fused-resblock kernel vs the XLA reference path (interpret mode on
CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsen2_tpu.ops.pallas.resblock import fused_resblock


def xla_resblock(x, w1, b1, w2, b2, scale=0.1):
    def conv(v, w, b):
        return (
            jax.lax.conv_general_dilated(
                v, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            )
            + b
        )

    t = jax.nn.relu(conv(x, w1, b1))
    return x + scale * conv(t, w2, b2)


@pytest.mark.parametrize("h,tile_rows", [(32, 8), (64, 16), (16, 16)])
def test_matches_xla(rng, h, tile_rows):
    c = 128
    x = jnp.asarray(rng.standard_normal((2, h, 24, c)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)

    want = np.asarray(xla_resblock(x, w1, b1, w2, b2))
    got = np.asarray(
        fused_resblock(x, w1, b1, w2, b2, tile_rows=tile_rows, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_zero_weights_identity(rng):
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 16, 16, c)).astype(np.float32))
    z = jnp.zeros((3, 3, c, c), jnp.float32)
    zb = jnp.zeros((c,), jnp.float32)
    got = np.asarray(fused_resblock(x, z, zb, z, zb, tile_rows=8, interpret=True))
    np.testing.assert_allclose(got, np.asarray(x), atol=0)


def test_tile_rows_one_rejected(rng):
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 8, 8, c)).astype(np.float32))
    z = jnp.zeros((3, 3, c, c), jnp.float32)
    zb = jnp.zeros((c,), jnp.float32)
    with pytest.raises(ValueError, match="tile_rows"):
        fused_resblock(x, z, zb, z, zb, tile_rows=1, interpret=True)


class TestFusedChain:
    """K-block chain kernel (ops/pallas/resblock_chain.py) vs K XLA
    resblocks, interpret mode."""

    def _params(self, rng, k, c):
        w1 = jnp.asarray(rng.standard_normal((k, 3, 3, c, c)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng.standard_normal((k, 3, 3, c, c)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32) * 0.1)
        return w1, b1, w2, b2

    def _want(self, x, w1, b1, w2, b2):
        for k in range(w1.shape[0]):
            x = xla_resblock(x, w1[k], b1[k], w2[k], b2[k])
        return np.asarray(x)

    @pytest.mark.parametrize("k,h,tile_rows", [
        (2, 32, 8), (2, 16, 16), (3, 48, 12), (3, 64, 16), (1, 32, 8),
    ])
    def test_matches_xla_chain(self, rng, k, h, tile_rows):
        from dsen2_tpu.ops.pallas.resblock_chain import fused_resblock_chain

        c = 128
        x = jnp.asarray(rng.standard_normal((2, h, 24, c)).astype(np.float32))
        w1, b1, w2, b2 = self._params(rng, k, c)
        want = self._want(x, w1, b1, w2, b2)
        got = np.asarray(fused_resblock_chain(
            x, w1, b1, w2, b2, tile_rows=tile_rows, interpret=True
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_tile_too_small_for_halo_rejected(self, rng):
        from dsen2_tpu.ops.pallas.resblock_chain import fused_resblock_chain

        c = 128
        x = jnp.asarray(rng.standard_normal((1, 32, 8, c)).astype(np.float32))
        w1, b1, w2, b2 = self._params(rng, 3, c)
        with pytest.raises(ValueError, match="tile_rows"):
            fused_resblock_chain(x, w1, b1, w2, b2, tile_rows=8, interpret=True)

    @pytest.mark.parametrize("k,h,tile_rows", [(2, 32, 8), (2, 16, 16)])
    def test_bf16x3_passes_match_f32_class(self, rng, k, h, tile_rows):
        """passes=3 (the 'high' accuracy class) must agree with the true-f32
        XLA chain to bf16x3 tolerance (~3e-5 relative per op) — far tighter
        than the single-bf16-pass class (~6e-3)."""
        from dsen2_tpu.ops.pallas.resblock_chain import fused_resblock_chain

        c = 128
        x = jnp.asarray(rng.standard_normal((2, h, 24, c)).astype(np.float32))
        w1, b1, w2, b2 = self._params(rng, k, c)
        want = self._want(x, w1, b1, w2, b2)
        got = np.asarray(fused_resblock_chain(
            x, w1, b1, w2, b2, tile_rows=tile_rows, interpret=True, passes=3
        ))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-4 * scale)

    def test_bf16x3_rejects_bf16_inputs(self, rng):
        from dsen2_tpu.ops.pallas.resblock_chain import fused_resblock_chain

        c = 128
        x = jnp.asarray(rng.standard_normal((1, 16, 8, c))).astype(jnp.bfloat16)
        w1, b1, w2, b2 = self._params(rng, 2, c)
        with pytest.raises(ValueError, match="passes=3"):
            fused_resblock_chain(x, w1, b1, w2, b2, tile_rows=16,
                                 interpret=True, passes=3)


def test_s2net_routes_even_models_through_chain(rng, monkeypatch):
    """use_pallas with an even block count must pair blocks through the
    chain kernel and match the XLA path (interpret mode on CPU)."""
    import functools

    from dsen2_tpu.core.config import ModelConfig
    from dsen2_tpu.models import s2net
    from dsen2_tpu.ops.pallas import resblock_chain

    calls = []
    orig = resblock_chain.fused_resblock_chain

    def spy(x, w1, b1, w2, b2, **kw):
        calls.append(w1.shape)
        return orig(x, w1, b1, w2, b2, **dict(kw, interpret=True))

    monkeypatch.setattr(resblock_chain, "fused_resblock_chain", spy)
    cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=32)
    params = s2net.init_params(jax.random.PRNGKey(3), cfg)
    x10 = jnp.asarray(rng.standard_normal((1, 32, 16, 4)).astype(np.float32))
    x20 = jnp.asarray(rng.standard_normal((1, 32, 16, 6)).astype(np.float32))
    # precision="default" is the kernel's single-pass class ("highest" has
    # no Pallas path and falls back to XLA with a warning).
    got = s2net.apply(params, (x10, x20), cfg, precision="default", use_pallas=True)
    want = s2net.apply(params, (x10, x20), cfg)
    assert calls and calls[0][0] == 2  # K=2 grouping reached the kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_s2net_high_precision_routes_bf16x3_kernel(rng, monkeypatch):
    """use_pallas + precision='high' must reach the chain kernel with
    passes=3 (class-matched bf16x3), not the single-pass class."""
    from dsen2_tpu.core.config import ModelConfig
    from dsen2_tpu.models import s2net
    from dsen2_tpu.ops.pallas import resblock_chain

    seen = []
    orig = resblock_chain.fused_resblock_chain

    def spy(x, w1, b1, w2, b2, **kw):
        seen.append(kw.get("passes", 1))
        return orig(x, w1, b1, w2, b2, **dict(kw, interpret=True))

    monkeypatch.setattr(resblock_chain, "fused_resblock_chain", spy)
    cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=32)
    params = s2net.init_params(jax.random.PRNGKey(4), cfg)
    x10 = jnp.asarray(rng.standard_normal((1, 32, 16, 4)).astype(np.float32))
    x20 = jnp.asarray(rng.standard_normal((1, 32, 16, 6)).astype(np.float32))
    got = s2net.apply(params, (x10, x20), cfg, precision="high", use_pallas=True)
    want = s2net.apply(params, (x10, x20), cfg, precision="highest")
    assert seen == [3]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-3)


def test_s2net_highest_plus_pallas_warns_and_uses_xla(rng):
    """There is no true-f32 kernel path: precision='highest' + use_pallas
    must warn and produce the XLA-highest result exactly."""
    from dsen2_tpu.core.config import ModelConfig
    from dsen2_tpu.models import s2net

    cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=32)
    params = s2net.init_params(jax.random.PRNGKey(5), cfg)
    x10 = jnp.asarray(rng.standard_normal((1, 16, 8, 4)).astype(np.float32))
    x20 = jnp.asarray(rng.standard_normal((1, 16, 8, 6)).astype(np.float32))
    with pytest.warns(UserWarning, match="no true-f32 path"):
        got = s2net.apply(params, (x10, x20), cfg, precision="highest",
                          use_pallas=True)
    want = s2net.apply(params, (x10, x20), cfg, precision="highest")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_odd_height_falls_back_to_xla(rng):
    """use_pallas on an odd-height input must warn and still be correct."""
    from dsen2_tpu.core.config import ModelConfig
    from dsen2_tpu.models import s2net

    cfg = ModelConfig(in_channels=(4, 6), num_layers=1, feature_size=128)
    params = s2net.init_params(jax.random.PRNGKey(0), cfg)
    x10 = jnp.asarray(rng.standard_normal((1, 9, 8, 4)).astype(np.float32))
    x20 = jnp.asarray(rng.standard_normal((1, 9, 8, 6)).astype(np.float32))
    with pytest.warns(UserWarning, match="even image height"):
        got = s2net.apply(params, (x10, x20), cfg, precision="default",
                          use_pallas=True)
    want = s2net.apply(params, (x10, x20), cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_wide_features_fall_back_to_xla(rng):
    """feature_size > 128 (the deep nets' 256) exceeds the kernel's scoped
    VMEM window — the TPU compiler rejects the program outright (measured:
    35.9 MB vs the 16 MB limit), so the route must warn and use XLA convs
    instead of shipping a config that cannot compile on hardware."""
    from dsen2_tpu.core.config import ModelConfig
    from dsen2_tpu.models import s2net

    cfg = ModelConfig(in_channels=(4, 6), num_layers=2, feature_size=256)
    params = s2net.init_params(jax.random.PRNGKey(1), cfg)
    x10 = jnp.asarray(rng.standard_normal((1, 16, 8, 4)).astype(np.float32))
    x20 = jnp.asarray(rng.standard_normal((1, 16, 8, 6)).astype(np.float32))
    with pytest.warns(UserWarning, match="does not fit above"):
        got = s2net.apply(params, (x10, x20), cfg, precision="default",
                          use_pallas=True)
    want = s2net.apply(params, (x10, x20), cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)
