"""The 8 square symmetries (dihedral group D4) for [H, W, C] rasters.

Used in two places: training-time augmentation (the paper's protocol —
flips/rotations; the reference has no augmentation code of its own,
training/supres_train.py trains on raw crops) and inference-time geometric
self-ensembling (infer/api.py: average the SR prediction over all 8
transforms — a standard SR accuracy boost the reference does not offer).

Encoding: code in [0, 8); code % 4 = quarter-turns, code >= 4 adds a flip
along axis 0 AFTER the rotation. Both a static-shape device op (for use
inside jit/scan — `lax.switch` over the 8 branches) and a numpy twin are
provided, plus the group inverse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dihedral", "dihedral_batch", "dihedral_np", "dihedral_static",
    "inverse_code",
]


def dihedral_static(x: jax.Array, code: int) -> jax.Array:
    """dihedral_np twin for device arrays with a STATIC (Python int) code —
    plain jnp ops, no lax.switch, for loops unrolled at trace time (the
    8-code self-ensemble)."""
    y = jnp.rot90(x, code % 4, axes=(0, 1))
    if code >= 4:
        y = jnp.flip(y, axis=0)
    return y


def dihedral(x: jax.Array, code: jax.Array) -> jax.Array:
    """Apply symmetry `code` to an [H, W, C] image (device op, jittable)."""
    branches = [
        lambda v: v,
        lambda v: jnp.rot90(v, 1, axes=(0, 1)),
        lambda v: jnp.rot90(v, 2, axes=(0, 1)),
        lambda v: jnp.rot90(v, 3, axes=(0, 1)),
        lambda v: jnp.flip(v, axis=0),
        lambda v: jnp.flip(jnp.rot90(v, 1, axes=(0, 1)), axis=0),
        lambda v: jnp.flip(jnp.rot90(v, 2, axes=(0, 1)), axis=0),
        lambda v: jnp.flip(jnp.rot90(v, 3, axes=(0, 1)), axis=0),
    ]
    return jax.lax.switch(code, branches, x)


dihedral_batch = jax.vmap(dihedral)


def dihedral_np(x: np.ndarray, code: int) -> np.ndarray:
    """numpy twin of dihedral() ([H, W, ...] arrays)."""
    y = np.rot90(x, code % 4, axes=(0, 1))
    if code >= 4:
        y = y[::-1]
    return np.ascontiguousarray(y)


# inverse_code[c] satisfies dihedral_np(dihedral_np(x, c), inverse_code[c]) == x.
# Rotations invert to the opposite turn; each flip-variant is an involution
# (flip o rot_k applied twice is the identity for every k).
inverse_code = (0, 3, 2, 1, 4, 5, 6, 7)
