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
