"""Weight loading, conversion and the default-weights registry.

The reference binds fixed weight files to each network variant
(testing/supres.py:56-60). This registry does the same, resolving in order:

  1. an explicit path in the DSEN2_TPU_WEIGHTS_DIR environment variable
     (EXCLUSIVE when set: ./models/ is NOT consulted, so an empty override
     dir deliberately yields the fresh-init fallback)
  2. ./models/ next to the repo root
  3. a deterministic fresh he_uniform init (clearly warned — the reference
     checkpoints are git-LFS blobs missing from the snapshot, so inference
     remains runnable end-to-end without them)
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Optional

import jax
import numpy as np

from dsen2_tpu.core.config import ModelConfig
from dsen2_tpu.models import s2net
from dsen2_tpu.weights.keras_h5 import load_keras_weights, save_keras_weights

__all__ = [
    "load_keras_weights",
    "save_keras_weights",
    "default_params",
    "reference_weight_filename",
    "save_params_npz",
    "load_params_npz",
]

# Weight-file naming from the reference (testing/supres.py:57,60).
_WEIGHT_FILES = {
    (False, False): "s2_032_lr_1e-04.hdf5",  # DSen2 2x
    (True, False): "s2_030_lr_1e-05.hdf5",  # DSen2_60 6x
    (False, True): "s2_033_lr_1e-04.hdf5",  # VDSen2 2x
    (True, True): "s2_034_lr_1e-04.hdf5",  # VDSen2_60 6x
}

_cache: Dict[tuple, Dict] = {}


def reference_weight_filename(run_60: bool, deep: bool) -> str:
    return _WEIGHT_FILES[(run_60, deep)]


def _search_dirs() -> list[str]:
    env = os.environ.get("DSEN2_TPU_WEIGHTS_DIR")
    if env:
        # Exclusive override: never silently fall back to the shipped weights,
        # so experiment drivers pointing at their own dir get exactly what
        # that dir holds (or the warned fresh init if it holds nothing).
        return [env]
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return [os.path.join(here, "models")]


def _resolve_weight_file(fname: str) -> Optional[str]:
    for d in _search_dirs():
        path = os.path.join(d, fname)
        if os.path.exists(path):
            return path
        npz_path = path.replace(".hdf5", ".npz")
        if os.path.exists(npz_path):
            return npz_path
    return None


def default_params(cfg: ModelConfig, run_60: bool, deep: bool) -> Dict:
    fname = reference_weight_filename(run_60, deep)
    found = _resolve_weight_file(fname)
    # Key the cache on the resolved file's identity (path + mtime + size),
    # not just the search dir: a dir that was empty at first call and gains
    # weights later (or gets retrained in-process) must not serve the stale
    # entry.
    stamp = None
    if found is not None:
        st = os.stat(found)
        stamp = (found, st.st_mtime_ns, st.st_size)
    key = (
        run_60,
        deep,
        cfg.num_layers,
        cfg.feature_size,
        cfg.in_channels,
        stamp,
    )
    if key in _cache:
        return _cache[key]

    params = None
    if found is not None:
        if found.endswith(".npz"):
            params = load_params_npz(found)
        else:
            params = load_keras_weights(found, cfg)
    if params is None:
        warnings.warn(
            f"pretrained weights {fname} not found (reference LFS blobs are "
            "absent from this snapshot); using a deterministic fresh "
            "he_uniform init — outputs are UNTRAINED",
            stacklevel=2,
        )
        params = s2net.init_params(jax.random.PRNGKey(0), cfg)
    _cache[key] = params
    return params


def save_params_npz(path: str, params: Dict) -> None:
    """Flat .npz dump of the params pytree (portable, dependency-free)."""
    flat = {}
    for top, sub in params.items():
        for name, arr in sub.items():
            flat[f"{top}.{name}"] = np.asarray(arr)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict:
    data = np.load(path)
    out: Dict = {}
    for key in data.files:
        top, name = key.split(".", 1)
        out.setdefault(top, {})[name] = data[key]
    return out
