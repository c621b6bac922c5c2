"""Accuracy metrics for super-resolved rasters.

The reference evaluates with a single global RMSE print
(testing/demoDSen2.py:31-35, matlab_demo/RMSE.m); the companion paper (arXiv
1803.04271) reports per-band RMSE and SRE tables. Both live here."""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["rmse", "per_band_rmse", "sre_db", "per_band_sre", "evaluation_table"]


def rmse(x: np.ndarray, y: np.ndarray) -> float:
    """Global root-mean-square error over all pixels/bands (float64)."""
    d = x.astype(np.float64) - y.astype(np.float64)
    return float(np.sqrt(np.mean(d * d)))


def per_band_rmse(sr: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """[C] RMSE per band for HWC rasters."""
    d = sr.astype(np.float64) - gt.astype(np.float64)
    return np.sqrt(np.mean(d * d, axis=(0, 1)))


def sre_db(sr: np.ndarray, gt: np.ndarray) -> float:
    """Signal-to-reconstruction-error ratio in dB, mean over bands."""
    return float(np.mean(per_band_sre(sr, gt)))


def per_band_sre(sr: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """[C] SRE per band: 10*log10(mean(gt^2) / mse)."""
    gt64 = gt.astype(np.float64)
    mse = np.mean((sr.astype(np.float64) - gt64) ** 2, axis=(0, 1))
    sig = np.mean(gt64 * gt64, axis=(0, 1))
    return 10.0 * np.log10(sig / np.maximum(mse, 1e-12))


def evaluation_table(
    sr: np.ndarray, gt: np.ndarray, baseline: np.ndarray, band_names=None
) -> str:
    """Paper-style comparison table: per-band RMSE and SRE for the network
    vs a baseline (typically bicubic), plus the global row."""
    c = gt.shape[-1]
    names = list(band_names) if band_names else [f"band{i}" for i in range(c)]
    r_sr, r_bl = per_band_rmse(sr, gt), per_band_rmse(baseline, gt)
    s_sr, s_bl = per_band_sre(sr, gt), per_band_sre(baseline, gt)
    lines = [
        f"{'band':>6} | {'RMSE sr':>9} {'RMSE base':>9} | {'SRE sr':>7} {'SRE base':>8}",
        "-" * 48,
    ]
    for i in range(c):
        lines.append(
            f"{names[i]:>6} | {r_sr[i]:9.2f} {r_bl[i]:9.2f} | {s_sr[i]:7.2f} {s_bl[i]:8.2f}"
        )
    lines.append(
        f"{'ALL':>6} | {rmse(sr, gt):9.2f} {rmse(baseline, gt):9.2f} | "
        f"{sre_db(sr, gt):7.2f} {sre_db(baseline, gt):8.2f}"
    )
    return "\n".join(lines)
