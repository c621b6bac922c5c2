"""Fused residual-block kernel: conv3x3 -> ReLU -> conv3x3 -> x0.1 -> add.

This is the model's hot loop (SURVEY.md §3: 2 convs x num_layers per patch,
the only device-side compute). XLA runs it as two conv ops with HBM-resident
activations between them — at 128 features on 128x128 patches each resblock
moves ~4 tensors x 8 MB through HBM for ~2.4 GFLOP of MXU work, i.e. it is
HBM-bandwidth bound. This kernel keeps the intermediate activation tile in
VMEM and writes only the block output, halving the traffic.

Design:
  - activations NHWC, C = feature lanes (128 = native lane width)
  - grid (batch, H / TILE_ROWS); each program computes TILE_ROWS output rows
  - the input stays in HBM (ANY); each program DMAs its TILE_ROWS + 4 row
    window (halo 2: one row per conv) into a VMEM scratch, zeroing halo rows
    that fall outside the image (SAME zero padding)
  - a 3x3 conv is 9 shifted [rows*W, C] x [C, Cout] MXU matmuls accumulated
    in f32; column taps come from a zero-padded width axis
  - conv1 + bias + ReLU + conv2 + bias + scale + residual-add all complete
    before anything leaves VMEM

Exercised against the XLA path in interpret mode by tests and benchmarked on
TPU; s2net.apply can route blocks through it with use_pallas=True.

Measured on TPU v5e (20 chained blocks, B64 128x128x128, amortised):

    XLA conv  default(bf16 pass) 81.5 TF/s | high(bf16x3) 55.6 | highest(f32) 29.7
    XLA conv  bf16 in/out        129.9 TF/s
    this kernel f32-in           65.6 TF/s | bf16 in/out  82.1 TF/s

XLA's convolutions beat this kernel at every matched precision on v5e —
the compiler already pipelines HBM traffic well at these shapes, so the
fusion hypothesis (activation traffic bound) does not hold. The kernel is
kept as a verified baseline and for future shapes/fusions where the
balance differs; the DEFAULT model path stays on XLA convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_resblock"]


def _conv_rows(x_pad, w, out_rows: int, width: int):
    """3x3 conv over a zero-padded row window.

    x_pad: [out_rows + 2, width + 2, C]; w: [3, 3, C, Cout] ->
    [out_rows, width, Cout] f32."""
    c_out = w.shape[-1]
    acc = jnp.zeros((out_rows * width, c_out), dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = x_pad[dy : dy + out_rows, dx : dx + width, :]
            acc = acc + jax.lax.dot_general(
                window.reshape(out_rows * width, -1),
                w[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc.reshape(out_rows, width, c_out)


def _resblock_kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, scratch, sem,
    *, tile_rows, height, width, scale, n_tiles,
):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    halo = 2

    # DMA the row window [ri*tile_rows - 2, ri*tile_rows + tile_rows + 2)
    # into scratch; rows outside the image stay zero. The single-tile case
    # is resolved statically (its slice sizes differ).
    if n_tiles == 1:
        scratch[...] = jnp.zeros_like(scratch)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(0, height), :, :],
            scratch.at[pl.ds(halo, height), :, :],
            sem,
        )
        cp.start()
        cp.wait()
    else:
        first = ri == 0
        last = ri == n_tiles - 1

        @pl.when(jnp.logical_or(first, last))
        def _():
            scratch[...] = jnp.zeros_like(scratch)

        @pl.when(first)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, tile_rows + halo), :, :],
                scratch.at[pl.ds(halo, tile_rows + halo), :, :],
                sem,
            )
            cp.start()
            cp.wait()

        @pl.when(last)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(height - tile_rows - halo, tile_rows + halo), :, :],
                scratch.at[pl.ds(0, tile_rows + halo), :, :],
                sem,
            )
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_not(jnp.logical_or(first, last)))
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(ri * tile_rows - halo, tile_rows + 2 * halo), :, :],
                scratch.at[...],
                sem,
            )
            cp.start()
            cp.wait()

    x = scratch[...]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))

    t = _conv_rows(xp, w1_ref[...], tile_rows + 2, width)
    t = jnp.maximum(t + b1_ref[...].reshape(1, 1, -1).astype(jnp.float32), 0.0)

    # Fusion correctness: conv2's SAME padding zero-pads t OUTSIDE the image,
    # so t halo rows beyond [0, H) must be zero, not conv1-of-padded-x.
    # t row i is absolute image row ri*tile_rows - 1 + i.
    t_abs = jax.lax.broadcasted_iota(jnp.int32, (tile_rows + 2, 1, 1), 0) + (
        ri * tile_rows - 1
    )
    t = jnp.where((t_abs >= 0) & (t_abs < height), t, 0.0)

    tp = jnp.pad(t.astype(x.dtype), ((0, 0), (1, 1), (0, 0)))
    y = _conv_rows(tp, w2_ref[...], tile_rows, width)
    y = y + b2_ref[...].reshape(1, 1, -1).astype(jnp.float32)

    center = x[halo : halo + tile_rows, :, :].astype(jnp.float32)
    out_ref[...] = (center + scale * y).astype(out_ref.dtype).reshape(out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("scale", "tile_rows", "interpret")
)
def fused_resblock(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    scale: float = 0.1,
    tile_rows: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """x: [B, H, W, C]; w*: [3, 3, C, C]; b*: [C].
    Returns x + scale * conv2(relu(conv1(x))) with SAME zero padding.
    H must be a multiple of tile_rows (and > tile_rows + 2 for the edge
    DMA variants to be well-formed)."""
    b, h, w, c = x.shape
    if h % tile_rows:
        raise ValueError(f"H={h} not a multiple of tile_rows={tile_rows}")
    n_tiles = h // tile_rows
    if n_tiles > 1 and tile_rows < 2:
        # middle-tile halo DMA [ri*t-2, ri*t+t+2) needs t >= 2 to stay in
        # bounds; t=1 would silently clamp and load a misaligned window
        raise ValueError("tile_rows must be >= 2 when the image has multiple tiles")

    kernel = functools.partial(
        _resblock_kernel,
        tile_rows=tile_rows, height=h, width=w, scale=scale, n_tiles=n_tiles,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, w, c),
            lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_rows + 4, w, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2)
