"""Microbenchmark: Pallas resblock kernels vs XLA convs on the real TPU.

Round-2 measured the single-block fused kernel losing to XLA at every
matched precision (docs/PERFORMANCE.md); the round-3 hypothesis is that the
loss was (a) the synchronous per-block window DMA and (b) per-block halo
recompute — both attacked by ops/pallas/resblock_chain.py (K blocks per
DMA, cross-step double buffering). This script produces the decision
numbers: TF/s on an 18-block chain, B x 128 x 128 x 128, bf16 and f32.

Usage: python scripts/bench_pallas.py [--batch 64] [--iters 5] [--blocks 18]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=18)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tile-rows", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dsen2_tpu.ops.pallas.resblock import fused_resblock
    from dsen2_tpu.ops.pallas.resblock_chain import fused_resblock_chain

    b, hw, c, nb = args.batch, args.size, args.feat, args.blocks
    flops = nb * 2 * 2 * b * hw * hw * c * c * 9  # 2 convs/block, 2 FLOP/MAC
    rng = np.random.default_rng(0)
    x_f32 = jnp.asarray(rng.standard_normal((b, hw, hw, c)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((nb, 3, 3, c, c)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((nb, 3, 3, c, c)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((nb, c)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((nb, c)).astype(np.float32) * 0.1)

    def xla_chain(x, w1, b1, w2, b2, precision=None):
        def block(x, wb):
            cw1, cb1, cw2, cb2 = wb
            t = jax.nn.relu(jax.lax.conv_general_dilated(
                x, cw1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision) + cb1)
            y = jax.lax.conv_general_dilated(
                t, cw2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision) + cb2
            return (x + 0.1 * y).astype(x.dtype), None

        out, _ = jax.lax.scan(block, x, (w1, b1, w2, b2))
        return out

    xla_jit = jax.jit(xla_chain)
    xla_high = jax.jit(
        lambda x, w1, b1, w2, b2: xla_chain(
            x, w1, b1, w2, b2, precision=jax.lax.Precision.HIGH
        )
    )

    def pallas_single(x, w1, b1, w2, b2):
        for k in range(nb):
            x = fused_resblock(x, w1[k], b1[k], w2[k], b2[k],
                               tile_rows=args.tile_rows)
        return x

    def bench(label, fn, *xs):
        # Sync via an 8-byte checksum readback: on this harness's tunneled
        # backend block_until_ready can return before the computation has
        # actually finished (measured "TF/s" beyond hardware peak), so the
        # scalar d2h is the only trustworthy completion barrier.
        def run_synced():
            s = float(jnp.sum(fn(*xs).astype(jnp.float32)))
            assert np.isfinite(s), s

        try:
            run_synced()
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                run_synced()
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(f"{label:42s} {best * 1e3:8.2f} ms   {flops / best / 1e12:7.1f} TF/s")
        except Exception as e:  # keep the sweep alive; report the failure
            msg = str(e).split("\n")[0][:160]
            print(f"{label:42s} FAILED: {type(e).__name__}: {msg}")

    for dt, x in (("f32", x_f32), ("bf16", x_f32.astype(jnp.bfloat16))):
        wd = [a.astype(x.dtype) for a in (w1, b1, w2, b2)]
        print(f"--- dtype {dt} ({b}x{hw}x{hw}x{c}, {nb} blocks) ---")
        bench(f"XLA conv chain [{dt}]", xla_jit, x, *wd)
        if dt == "f32":
            # The bf16x3 'high' accuracy class (what the parity-default
            # inference path runs): XLA Precision.HIGH vs passes=3 kernel.
            bench(f"XLA conv chain HIGH bf16x3 [{dt}]", xla_high, x, *wd)
        bench(f"pallas single-block (r2 kernel) [{dt}]", pallas_single, x, *wd)
        for k in (2, 3, 6):
            if nb % k:
                continue
            kw1 = wd[0].reshape(nb // k, k, 3, 3, c, c)
            kb1 = wd[1].reshape(nb // k, k, c)
            kw2 = wd[2].reshape(nb // k, k, 3, 3, c, c)
            kb2 = wd[3].reshape(nb // k, k, c)
            # smallest row tile that divides H and fits the 4K halo rule
            tr = next((t for t in (8, 16, 32, 64, 128)
                       if t >= max(args.tile_rows, 4 * k) and hw % t == 0), hw)

            def chain_fn(x, passes=1, kw1=kw1, kb1=kb1, kw2=kw2, kb2=kb2,
                         k=k, tr=tr):
                for g in range(nb // k):
                    x = fused_resblock_chain(
                        x, kw1[g], kb1[g], kw2[g], kb2[g], tile_rows=tr,
                        passes=passes)
                return x

            bench(f"pallas chain K={k} tile={tr} [{dt}]", chain_fn, x)
            if dt == "f32":
                bench(f"pallas chain K={k} tile={tr} bf16x3 [{dt}]",
                      lambda x, f=chain_fn: f(x, passes=3), x)
    return 0


if __name__ == "__main__":
    sys.exit(main())
