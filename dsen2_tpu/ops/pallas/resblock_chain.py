"""Fused K-resblock CHAIN kernel with cross-step double-buffered DMA.

Round-2's single-block kernel (ops/pallas/resblock.py) lost to XLA's convs
at every matched precision; its two documented costs were (a) one
synchronous halo-window DMA per block per row-tile and (b) halo recompute.
This kernel attacks both:

  - K consecutive resblocks execute per window DMA (the halo grows to 2K
    rows per side, but the HBM round-trip of the activation tensor happens
    once per K blocks instead of once per block);
  - the window DMA for grid step s+1 is issued BEFORE the compute of step
    s (two VMEM window slots, one DMA semaphore per slot), so the copy of
    the next window overlaps the current window's MXU work — the
    round-2 kernel waited on its own copy synchronously.

Correctness contract (== K applications of the reference resBlock,
utils/DSen2Net.py:9-15, with SAME zero padding): rows whose absolute index
falls outside the image must be ZERO at every stage boundary — conv of a
zero-padded row is bias, not zero, so each conv output is re-masked before
it feeds the next stage.

Measured verdict lives in docs/PERFORMANCE.md (scripts/bench_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_resblock_chain"]


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _split_bf16(a):
    """Two-term bf16 decomposition: a ~= hi + lo with hi = rnd_bf16(a)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _conv_rows(x_pad, w, out_rows: int, width: int, passes: int = 1):
    """3x3 conv over a width-zero-padded row window.
    x_pad: [out_rows + 2, width + 2, C]; w: [3, 3, C, Cout] ->
    [out_rows, width, Cout] f32.

    passes=1: each tap is ONE MXU dot at the operands' dtype (bf16 inputs ->
    the single-pass 'default' accuracy class). passes=3: bf16x3 — operands
    split into hi+lo bf16 terms and each tap computed as
    hi*hi + lo*hi + hi*lo with f32 accumulation, the same accuracy class as
    XLA's Precision.HIGH (~3e-5 relative; the lo*lo term is below f32
    rounding and dropped, exactly like XLA)."""
    c_out = w.shape[-1]
    acc = jnp.zeros((out_rows * width, c_out), dtype=jnp.float32)
    if passes == 3:
        xh, xl = _split_bf16(x_pad.astype(jnp.float32))
        wh, wl = _split_bf16(w.astype(jnp.float32))  # split once, not per tap
        for dy in range(3):
            for dx in range(3):
                winh = xh[dy : dy + out_rows, dx : dx + width, :].reshape(
                    out_rows * width, -1
                )
                winl = xl[dy : dy + out_rows, dx : dx + width, :].reshape(
                    out_rows * width, -1
                )
                acc = acc + _dot_f32(winh, wh[dy, dx])
                acc = acc + _dot_f32(winl, wh[dy, dx])
                acc = acc + _dot_f32(winh, wl[dy, dx])
        return acc.reshape(out_rows, width, c_out)
    for dy in range(3):
        for dx in range(3):
            window = x_pad[dy : dy + out_rows, dx : dx + width, :]
            acc = acc + _dot_f32(window.reshape(out_rows * width, -1), w[dy, dx])
    return acc.reshape(out_rows, width, c_out)


def _mask_rows(t, start_abs, height):
    """Zero rows whose absolute image row falls outside [0, height)."""
    abs_row = jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], 1, 1), 0) + start_abs
    return jnp.where((abs_row >= 0) & (abs_row < height), t, 0.0)


def _chain_kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, win, sems,
    *, k_blocks, tile_rows, height, width, scale, n_tiles, n_batch,
    passes,
):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    halo = 2 * k_blocks
    win_rows = tile_rows + 2 * halo
    step = bi * n_tiles + ri
    total = n_batch * n_tiles

    def dma_apply(s, slot, do):
        """Apply `do` ("start": zero edge fills + launch; "wait": block on
        completion) for linear step s's window copy in slot `slot`. The
        wait path rebuilds the SAME copy descriptors as the start path —
        TPU DMA semaphores count bytes, so the waiting descriptor must
        match the started one."""
        b = s // n_tiles
        r = s % n_tiles

        def act(cp):
            cp.start() if do == "start" else cp.wait()

        if n_tiles == 1:
            if do == "start":
                win[slot] = jnp.zeros_like(win[slot])
            act(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, height), :, :],
                win.at[slot, pl.ds(halo, height), :, :],
                sems.at[slot],
            ))
            return
        first = r == 0
        last = r == n_tiles - 1

        if do == "start":
            @pl.when(jnp.logical_or(first, last))
            def _():
                win[slot] = jnp.zeros_like(win[slot])

        @pl.when(first)
        def _():
            act(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, tile_rows + halo), :, :],
                win.at[slot, pl.ds(halo, tile_rows + halo), :, :],
                sems.at[slot],
            ))

        @pl.when(last)
        def _():
            act(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(height - tile_rows - halo, tile_rows + halo), :, :],
                win.at[slot, pl.ds(0, tile_rows + halo), :, :],
                sems.at[slot],
            ))

        @pl.when(jnp.logical_not(jnp.logical_or(first, last)))
        def _():
            act(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(r * tile_rows - halo, win_rows), :, :],
                win.at[slot, ...],
                sems.at[slot],
            ))

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma_apply(step, slot, "start")

    @pl.when(step + 1 < total)
    def _():
        dma_apply(step + 1, jax.lax.rem(step + 1, 2), "start")

    dma_apply(step, slot, "wait")

    cur = win[slot]
    start_abs = ri * tile_rows - halo
    rows = win_rows
    for k in range(k_blocks):
        xp = jnp.pad(cur, ((0, 0), (1, 1), (0, 0)))
        t = _conv_rows(xp, w1_ref[k], rows - 2, width, passes)
        t = jnp.maximum(t + b1_ref[k].reshape(1, 1, -1).astype(jnp.float32), 0.0)
        t = _mask_rows(t, start_abs + 1, height)

        tp = jnp.pad(t.astype(cur.dtype), ((0, 0), (1, 1), (0, 0)))
        y = _conv_rows(tp, w2_ref[k], rows - 4, width, passes)
        y = y + b2_ref[k].reshape(1, 1, -1).astype(jnp.float32)

        center = cur[2 : rows - 2, :, :].astype(jnp.float32)
        out = _mask_rows(center + scale * y, start_abs + 2, height)
        cur = out.astype(cur.dtype)
        start_abs += 2
        rows -= 4

    out_ref[...] = cur.reshape(out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("scale", "tile_rows", "interpret", "passes")
)
def fused_resblock_chain(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    scale: float = 0.1,
    tile_rows: int = 16,
    interpret: bool = False,
    passes: int = 1,
) -> jax.Array:
    """Apply K chained resblocks: x: [B, H, W, C]; w1/w2: [K, 3, 3, C, C];
    b1/b2: [K, C]. Returns the result of K sequential
    `x + scale*conv2(relu(conv1(x)))` blocks with SAME zero padding.

    passes: MXU passes per tap — 1 = single bf16 pass (the 'default'
    accuracy class), 3 = bf16x3 hi/lo decomposition (the 'high' class,
    ~3e-5 relative vs true f32; see _conv_rows). passes=3 requires f32 x.

    Constraints: H % tile_rows == 0 and tile_rows >= 4*K (window slicing
    for edge tiles must stay in bounds), H >= tile_rows + 4*K when the
    grid has more than one row tile."""
    b, h, w, c = x.shape
    if passes not in (1, 3):
        raise ValueError(f"passes must be 1 or 3, got {passes}")
    if passes == 3 and x.dtype != jnp.float32:
        raise ValueError("passes=3 (the bf16x3 'high' class) requires f32 inputs")
    k_blocks = int(w1.shape[0])
    halo = 2 * k_blocks
    if h % tile_rows:
        raise ValueError(f"H={h} not a multiple of tile_rows={tile_rows}")
    n_tiles = h // tile_rows
    if n_tiles > 1 and tile_rows < 2 * halo:
        raise ValueError(
            f"tile_rows={tile_rows} must be >= {2 * halo} (=4K) with multiple tiles"
        )
    if n_tiles > 1 and h < tile_rows + halo:
        raise ValueError("image too short for the edge window copies")

    kernel = functools.partial(
        _chain_kernel,
        k_blocks=k_blocks, tile_rows=tile_rows, height=h, width=w,
        scale=scale, n_tiles=n_tiles, n_batch=b, passes=passes,
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
            pltpu.VMEM((2, tile_rows + 2 * halo, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2)
