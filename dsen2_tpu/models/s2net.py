"""The DSen2 residual CNN family as a functional JAX model.

Architecture parity with the reference (utils/DSen2Net.py:9-43):

    x = concat(inputs, channel axis)
    x = relu(conv3x3(x, F))                       # head
    repeat L times:                               # resBlock
        t = relu(conv3x3(x, F))
        t = conv3x3(t, F) * 0.1
        x = x + t
    x = conv3x3(x, C_out)                         # tail
    out = x + inputs[-1]                          # global residual over the
                                                  # upsampled LR bands

TPU-first choices (deliberately NOT a Keras translation):
  - NHWC activations / HWIO kernels (the TPU-native conv layout; the
    reference forces channels_first for cuDNN, utils/DSen2Net.py:6)
  - residual blocks hold their parameters stacked on a leading layer axis and
    run under `lax.scan` + optional rematerialisation, so VDSen2's 32 blocks
    compile fast and fit HBM during training
  - precision is explicit: Precision.HIGHEST (true f32 matmuls) on the parity
    path, DEFAULT (bf16 MXU passes) as the opt-in fast path
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dsen2_tpu.core.config import ModelConfig

Params = Dict[str, Any]

__all__ = [
    "init_params", "apply", "param_count", "resolve_use_pallas",
    "stack_block_params",
]


def resolve_use_pallas(use_pallas, precision: str) -> bool:
    """Resolve the use_pallas tri-state (None = AUTO) exactly as apply()
    does — the single source of truth, so reporting code (bench.py) cannot
    drift from the routing. AUTO enables the fused chain kernel only where
    it measured faster than XLA at the matched accuracy class:
    precision="default" on a TPU backend (scripts/bench_pallas.py)."""
    if use_pallas is None:
        return precision == "default" and jax.default_backend() == "tpu"
    return bool(use_pallas)


def _he_uniform(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Keras 'he_uniform' init: U(-limit, limit), limit = sqrt(6 / fan_in),
    fan_in = kh * kw * in_ch for HWIO kernels (reference layers use
    kernel_initializer='he_uniform', utils/DSen2Net.py:10,12,29,35)."""
    fan_in = int(np.prod(shape[:-1]))
    limit = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    """Fresh parameters. Layout:

      head:   w [3,3,C_in,F],  b [F]
      blocks: w1,b1,w2,b2 each stacked on a leading [L] axis
      tail:   w [3,3,F,C_out], b [C_out]
    """
    f = cfg.feature_size
    cin = cfg.total_in_channels
    cout = cfg.out_channels
    n_l = cfg.num_layers
    keys = jax.random.split(key, 2 + 2 * n_l)

    def stacked(ks):
        if n_l == 0:
            return jnp.zeros((0, 3, 3, f, f), dtype)
        return jnp.stack([_he_uniform(k, (3, 3, f, f), dtype) for k in ks])

    blocks_w1 = stacked(keys[1 : 1 + n_l])
    blocks_w2 = stacked(keys[1 + n_l : 1 + 2 * n_l])
    return {
        "head": {"w": _he_uniform(keys[0], (3, 3, cin, f), dtype), "b": jnp.zeros((f,), dtype)},
        "blocks": {
            "w1": blocks_w1,
            "b1": jnp.zeros((n_l, f), dtype),
            "w2": blocks_w2,
            "b2": jnp.zeros((n_l, f), dtype),
        },
        "tail": {"w": _he_uniform(keys[-1], (3, 3, f, cout), dtype), "b": jnp.zeros((cout,), dtype)},
    }


def stack_block_params(block_list: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-block {'w1','b1','w2','b2'} dicts onto a leading layer axis
    (used by the Keras-HDF5 weight converter)."""
    return {k: np.stack([b[k] for b in block_list]) for k in ("w1", "b1", "w2", "b2")}


def _conv(x: jax.Array, w: jax.Array, b: jax.Array, precision) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    return y + b


def apply(
    params: Params,
    inputs: Sequence[jax.Array],
    cfg: ModelConfig,
    *,
    precision: str = "highest",
    remat: bool = False,
    use_pallas=False,
) -> jax.Array:
    """Forward pass. inputs: tuple of NHWC arrays (x10, x20_up[, x60_up]),
    all on the 10 m grid, already divided by SCALE. Returns NHWC prediction
    of cfg.out_channels bands (still divided by SCALE).

    use_pallas routes the residual blocks through the fused Pallas kernel
    (dsen2_tpu.ops.pallas.resblock_chain) — one VMEM-resident pass per
    block pair instead of HBM-bound convolutions. The kernel matches the
    requested precision class: single-pass taps for "default", bf16x3
    hi/lo taps for "high" (class-correct but measured SLOWER than XLA
    Precision.HIGH on v5e — 47.1 vs 55.2 TF/s, docs/PERFORMANCE.md —
    honored only on an explicit use_pallas=True); "highest" (true f32)
    has no Pallas path and falls back to XLA with a warning.
    use_pallas=None means AUTO: on exactly where the kernel measured
    faster than XLA at the matched class (precision="default", +18%
    end-to-end), off otherwise."""
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]

    # None = AUTO: faster-than-XLA classes only (see resolve_use_pallas —
    # the single source of truth; its docstring carries the measurements).
    use_pallas = resolve_use_pallas(use_pallas, precision)

    x = jnp.concatenate(list(inputs), axis=-1)
    x = jax.nn.relu(_conv(x, params["head"]["w"], params["head"]["b"], prec))

    scale = jnp.asarray(cfg.residual_scale, x.dtype)

    if use_pallas and precision == "highest":
        # No true-f32 kernel path: silently degrading the requested
        # accuracy class would be worse than losing the fusion.
        import warnings

        warnings.warn(
            "use_pallas has no true-f32 path; precision='highest' uses "
            "XLA convs (pass precision='high' for the bf16x3 kernel)"
        )
        use_pallas = False
    pallas_passes = 3 if precision == "high" else 1
    if use_pallas and pallas_passes == 3 and x.dtype != jnp.float32:
        import warnings

        warnings.warn(
            "use_pallas with precision='high' needs f32 activations; "
            "bf16 compute_dtype runs the single-pass kernel instead"
        )
        pallas_passes = 1

    if use_pallas and x.shape[1] % 2:
        # the fused kernel needs tile_rows >= 2; odd heights fall back to XLA
        import warnings

        warnings.warn("use_pallas requires an even image height; using XLA convs")
        use_pallas = False

    if use_pallas and cfg.feature_size > 128:
        # VMEM feasibility gate: the chain kernel keeps double-buffered
        # [tile_rows+halo, W, F] activation windows in scoped VMEM; at 256
        # features the scoped allocation exceeds the 16 MB limit and the
        # TPU compiler rejects the program outright (measured: 35.9 MB at
        # the deep nets' 128-px patches). The kernel was built and wins at
        # the shallow nets' 128 features; wider nets take XLA convs.
        import warnings

        warnings.warn(
            "use_pallas: the fused kernel's VMEM window does not fit above "
            "128 features; this config uses XLA convs"
        )
        use_pallas = False

    scan_xs = params["blocks"]
    if use_pallas:
        h = x.shape[1]
        # Prefer the K=2 fused CHAIN kernel (two resblocks per window DMA,
        # cross-step double buffering) — measured 107-113 TF/s vs XLA's
        # 80-92 on the 18-block single-pass microbench
        # (scripts/bench_pallas.py). Needs an even block count and a row
        # tile >= 8 dividing H; otherwise the single-block kernel.
        chain_tile = next((t for t in (16, 8) if h % t == 0), None)
        if cfg.num_layers % 2 == 0 and chain_tile is not None:
            from dsen2_tpu.ops.pallas.resblock_chain import fused_resblock_chain

            scan_xs = jax.tree_util.tree_map(
                lambda a: a.reshape(cfg.num_layers // 2, 2, *a.shape[1:]),
                params["blocks"],
            )

            def block(x, p):
                return (
                    fused_resblock_chain(
                        x, p["w1"], p["b1"], p["w2"], p["b2"],
                        scale=cfg.residual_scale, tile_rows=chain_tile,
                        passes=pallas_passes,
                    ),
                    None,
                )

        elif pallas_passes == 3:
            # The single-block fallback kernel is single-pass only; running
            # it would silently degrade the requested "high" class, so odd
            # block counts / unfit row tiles take the XLA convs instead.
            import warnings

            warnings.warn(
                "use_pallas with precision='high' needs an even block count "
                "and a row tile of 8/16 dividing the image height; this "
                "config falls back to XLA convs"
            )
            use_pallas = False
        else:
            from dsen2_tpu.ops.pallas.resblock import fused_resblock

            tile_rows = max(t for t in (16, 8, 4, 2) if h % t == 0)

            def block(x, p):
                return (
                    fused_resblock(
                        x, p["w1"], p["b1"], p["w2"], p["b2"],
                        scale=cfg.residual_scale, tile_rows=tile_rows,
                    ),
                    None,
                )

    if not use_pallas:

        def block(x, p):
            t = jax.nn.relu(_conv(x, p["w1"], p["b1"], prec))
            t = _conv(t, p["w2"], p["b2"], prec)
            return x + scale * t, None

    block_fn = jax.checkpoint(block) if remat else block
    x, _ = jax.lax.scan(block_fn, x, scan_xs)

    x = _conv(x, params["tail"]["w"], params["tail"]["b"], prec)
    return x + inputs[-1]


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def summary(cfg: ModelConfig) -> str:
    """Architecture summary text (capability parity with the reference's
    fresh-run model.yaml/plot_model dump, training/supres_train.py:189-193)."""
    f, n_l = cfg.feature_size, cfg.num_layers
    cin, cout = cfg.total_in_channels, cfg.out_channels

    def conv_params(ci, co):
        return 3 * 3 * ci * co + co

    lines = [
        f"s2model: inputs {cfg.in_channels} -> concat({cin}) -> "
        f"{n_l} resblocks x {f} -> {cout} + global residual",
        f"{'layer':<22}{'output ch':>10}{'params':>12}",
        f"{'head conv3x3 + relu':<22}{f:>10}{conv_params(cin, f):>12,}",
    ]
    for i in range(n_l):
        lines.append(
            f"{'resblock_%d (2x conv)' % i:<22}{f:>10}{2 * conv_params(f, f):>12,}"
        )
    lines.append(f"{'tail conv3x3':<22}{cout:>10}{conv_params(f, cout):>12,}")
    total = conv_params(cin, f) + n_l * 2 * conv_params(f, f) + conv_params(f, cout)
    lines.append(f"{'TOTAL':<22}{'':>10}{total:>12,}")
    return "\n".join(lines)
