"""MATLAB v7.3 (.mat / HDF5) demo-scene loader.

Capability match for the reference's readh5 (testing/demoDSen2.py:14-28):
scenes store im10/im20/im60/imGT channel-first; transposing yields HWC.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["read_scene"]


def read_scene(path: str) -> Dict[str, np.ndarray]:
    """Load every raster in a demo .mat scene as float32 HWC arrays keyed by
    name (im10, im20, and when present im60, imGT)."""
    import h5py

    out: Dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        for key in f:
            arr = np.asarray(f[key])
            if arr.ndim == 3:
                out[key] = arr.transpose().astype(np.float32)
    return out
