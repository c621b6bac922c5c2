"""Model / inference / training configuration dataclasses.

Mirrors the reference's implicit configuration space:
  - DSen2 (6 resblocks x 128 features) vs VDSen2 (32 x 256)
    (reference: testing/supres.py:56,59; training/supres_train.py:130,133)
  - 2x network (10m+20m -> 20m bands at 10m) vs 6x network (+60m inputs)
  - patch/border geometry (reference: testing/supres.py:21-22,40-41)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the residual super-resolution CNN.

    reference: utils/DSen2Net.py:18-43 (s2model), :9-15 (resBlock).
    """

    in_channels: Tuple[int, ...] = (4, 6)  # (10m bands, 20m bands[, 60m bands])
    num_layers: int = 6
    feature_size: int = 128
    residual_scale: float = 0.1
    # Output channels == channels of the LAST input (the LR bands being
    # super-resolved); the global residual adds that input back
    # (reference: utils/DSen2Net.py:35,38,41).

    @property
    def out_channels(self) -> int:
        return self.in_channels[-1]

    @property
    def total_in_channels(self) -> int:
        return sum(self.in_channels)

    @property
    def run_60(self) -> bool:
        return len(self.in_channels) == 3


def dsen2_2x(deep: bool = False) -> ModelConfig:
    """DSen2/VDSen2 2x (20m->10m) config (reference: testing/supres.py:26,56,59)."""
    return ModelConfig(
        in_channels=(4, 6),
        num_layers=32 if deep else 6,
        feature_size=256 if deep else 128,
    )


def dsen2_6x(deep: bool = False) -> ModelConfig:
    """DSen2_60/VDSen2_60 6x (60m->10m) config (reference: testing/supres.py:46,56,59)."""
    return ModelConfig(
        in_channels=(4, 6, 2),
        num_layers=32 if deep else 6,
        feature_size=256 if deep else 128,
    )


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """Patch geometry + numerics for tiled inference.

    Patch sizes/borders follow the reference inference API
    (testing/supres.py:21-22 for 2x: 128/8; :40-41 for 6x: 192/12).
    """

    patch_size: int = 128  # on the 10m (HR) grid
    border: int = 8  # on the 10m (HR) grid
    batch_size: int = 64  # patches per device step
    # Conv/matmul precision on TPU:
    #   "highest" — true f32 (bitwise-closest to the reference; slowest)
    #   "high"    — bf16x3 passes; measured ~3e-5 relative error on real
    #               scenes (RMSE 0.08 on signal std 2450) at ~1.8x the speed
    #               of "highest" -> the default
    #   "default" — single bf16 pass; ~6e-3 relative (RMSE ~15): turbo mode
    precision: str = "high"
    compute_dtype: str = "float32"
    # Route the residual blocks through the fused Pallas K=2 chain kernel
    # (ops/pallas/resblock_chain.py). None = AUTO (the default): the kernel
    # runs exactly where it measured faster than XLA at the matched
    # accuracy class — precision="default" (single-pass taps, +18%
    # end-to-end) — and stays off for "high"/"highest", where XLA won
    # (scripts/bench_pallas.py; docs/PERFORMANCE.md). True forces it
    # (including the class-matched bf16x3 mode for "high", measured 0.85x
    # XLA); False forces XLA convs.
    use_pallas: Optional[bool] = None
    # Mosaic output / readback dtype:
    #   "float32"  — the parity default.
    #   "uint16"   — rounded, clipped [0, 65535] integer reflectance: halves
    #                device->host bytes. Lossless for the data's semantics —
    #                Sentinel-2 L1C reflectance is integer-valued at source
    #                and the reference's own writer quantizes implicitly
    #                (testing/s2_tiles_supres.py:397 writes Float64 of f32).
    #   "bfloat16" — half the bytes at ~3 significant digits.
    output_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: training/supres_train.py:23-25,130-144,203-209)."""

    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    schedule_decay: float = 0.004  # Keras-2 Nadam momentum schedule decay
    batch_size: int = 128  # 8 for VDSen2 (reference :131,134)
    epochs: int = 8 * 1024
    # ReduceLROnPlateau (reference :203-209)
    plateau_factor: float = 0.5
    plateau_patience: int = 5
    plateau_cooldown: int = 20
    plateau_min_lr: float = 1e-5
    plateau_min_delta: float = 1e-6
    val_fraction: float = 0.1
    seed: int = 0
    model_nr: str = "s2_038_"
    out_dir: Optional[str] = None
    # Periodic full-state (params + Nadam moments + plateau + history) orbax
    # checkpoint cadence, in epochs; 0 disables. The reference can only resume
    # weights (training/supres_train.py:181-185); this makes the exact
    # trajectory resumable after any crash, not just Ctrl-C.
    state_every: int = 25
    # Random dihedral (flip/rot90) augmentation of training samples — the
    # paper's protocol; applied identically to every input and the label.
    # Deterministic per (seed, epoch), so resume keeps the trajectory.
    augment: bool = False
