"""Halo-patch decomposition and border-crop mosaic, TPU-native.

The reference scales to arbitrarily large rasters spatially: overlapping
fixed-size patches with symmetric-padded halos, stride = patch - 2*border so
each patch contributes only its interior, an edge-flush final row/column when
the stride does not divide, and a border-cropped last-write-wins mosaic
(reference: utils/patches.py:19-156 extractors, :374-405 recompose).

Here the same decomposition becomes static-shape, jit-friendly device ops:

  - the patch grid is computed once on host (plain ints; `PatchGrid`)
  - extraction = symmetric pad + a vmapped dynamic_slice gather
  - recompose  = a scan of dynamic_update_slice in the reference's patch
    order, which reproduces its last-write-wins overlap semantics exactly

Because each patch carries its own halo, the convolution stage needs NO
inter-chip communication — patches shard freely over the device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PatchGrid", "extract_patches", "recompose", "recompose_positions"]


@dataclasses.dataclass(frozen=True)
class PatchGrid:
    """Static geometry of the overlapping patch decomposition along one image.

    Computed on the grid of the coarsest input raster (20 m for the 2x
    network, 60 m for the 6x network), exactly like the reference
    (utils/patches.py:32-53,101-122). All coordinates are in pixels of that
    raster, measured in the PADDED image (padding = `border` on each side).
    """

    height: int  # unpadded image height on this raster
    width: int
    patch: int  # patch size on this raster
    border: int  # halo on this raster

    @property
    def stride(self) -> int:
        return self.patch - 2 * self.border

    def starts_1d(self, n: int) -> tuple[int, ...]:
        """Patch start offsets (in padded coordinates) along an axis of
        unpadded length n. Regular stride-spaced starts plus an edge-flush
        final start when the stride does not divide n
        (reference: utils/patches.py:45-53)."""
        s = self.stride
        if n < s:
            raise ValueError(
                f"image extent {n} is smaller than the patch interior {s} "
                f"(patch {self.patch}, border {self.border}); use a smaller "
                "patch size"
            )
        starts = [i * s for i in range(n // s)]
        if n % s != 0:
            starts.append(n + 2 * self.border - self.patch)
        return tuple(starts)

    @property
    def starts_i(self) -> tuple[int, ...]:
        return self.starts_1d(self.height)

    @property
    def starts_j(self) -> tuple[int, ...]:
        return self.starts_1d(self.width)

    @property
    def num_patches(self) -> int:
        return len(self.starts_i) * len(self.starts_j)

    @property
    def slack_patches(self) -> int:
        """The reference over-allocates (k+1)^2 patch slots and leaves unused
        trailing slots zero (utils/patches.py:35,104); this is the number of
        zero slots needed to reproduce its on-disk patch-archive format."""
        k_i = self.height // self.stride
        k_j = self.width // self.stride
        return (k_i + 1) * (k_j + 1) - self.num_patches

    def scaled(self, factor: int) -> "PatchGrid":
        """The same grid expressed on a raster `factor`x finer (e.g. the 60 m
        grid scaled by 3 -> the 20 m crop offsets; utils/patches.py:136-137)."""
        return PatchGrid(
            self.height * factor, self.width * factor,
            self.patch * factor, self.border * factor,
        )

    def flat_starts(self) -> np.ndarray:
        """[N, 2] int32 array of (i, j) patch starts in padded coordinates,
        row-major in the reference's iteration order (i outer, j inner)."""
        si, sj = self.starts_i, self.starts_j
        out = np.empty((len(si) * len(sj), 2), dtype=np.int32)
        k = 0
        for i in si:
            for j in sj:
                out[k, 0] = i
                out[k, 1] = j
                k += 1
        return out


def extract_patches(img: jax.Array, grid: PatchGrid) -> jax.Array:
    """Symmetric-pad [H, W, C] by grid.border and gather all [patch, patch, C]
    halo patches in the reference's order -> [N, patch, patch, C].

    Device equivalent of the extraction loops in utils/patches.py:59-72 and
    :127-144 (which roll to CHW; we stay NHWC, the TPU-friendly layout).
    """
    b, p = grid.border, grid.patch
    padded = jnp.pad(img, ((b, b), (b, b), (0, 0)), mode="symmetric")
    starts = jnp.asarray(grid.flat_starts())
    c = img.shape[-1]

    def one(start):
        return jax.lax.dynamic_slice(padded, (start[0], start[1], 0), (p, p, c))

    return jax.vmap(one)(starts)


def recompose_positions(out_hw: tuple[int, int], interior: int) -> np.ndarray:
    """[N, 2] int32 output-space positions where each patch interior lands,
    in the reference's mosaic order with edge clamping
    (utils/patches.py:394-403): position = tile_index * interior, clamped to
    size - interior; y outer, x inner; N = ceil(H/interior)*ceil(W/interior).
    """
    h, w = out_hw
    ny = -(-h // interior)
    nx = -(-w // interior)
    pos = np.empty((ny * nx, 2), dtype=np.int32)
    k = 0
    for y in range(ny):
        yp = min(y * interior, h - interior)
        for x in range(nx):
            xp = min(x * interior, w - interior)
            pos[k, 0] = yp
            pos[k, 1] = xp
            k += 1
    return pos


def recompose(
    patches: jax.Array,
    border: int,
    out_hw: tuple[int, int],
    out: Optional[jax.Array] = None,
) -> jax.Array:
    """Crop `border` pixels from every patch edge and mosaic the interiors
    into an [H, W, C] image, sequentially in the reference's order so
    overlapping (edge-flush) patches resolve last-write-wins exactly like
    utils/patches.py:374-405.

    patches: [N, P, P, C] with N >= ceil(H/(P-2b)) * ceil(W/(P-2b)); extra
    trailing patches (the reference's zero-filled slack slots) are ignored.
    A single patch with border 0 covering the image short-circuits, like the
    reference's one-patch path (utils/patches.py:375-376).
    """
    n, p, _, c = patches.shape
    s = p - 2 * border
    h, w = out_hw
    if n == 1 and border == 0 and (h, w) == (p, p):
        return patches[0]

    if s > h or s > w:
        raise ValueError(
            f"recompose: patch interior {s} exceeds the image {out_hw}; "
            "the patch/border geometry is too large for this image"
        )
    pos = recompose_positions(out_hw, s)
    needed = pos.shape[0]
    if n < needed:
        raise ValueError(f"recompose: got {n} patches, grid needs {needed}")
    interiors = patches[:needed, border : p - border, border : p - border, :]
    positions = jnp.asarray(pos)

    if out is None:
        out = jnp.zeros((h, w, c), dtype=patches.dtype)

    def step(img, xs):
        patch, yx = xs
        img = jax.lax.dynamic_update_slice(img, patch, (yx[0], yx[1], 0))
        return img, None

    out, _ = jax.lax.scan(step, out, (interiors, positions))
    return out


def pad_patch_slack(patches: np.ndarray, grid: PatchGrid) -> np.ndarray:
    """Append the reference's zero slack slots to a host patch array so saved
    archives are bit-compatible with reference-created ones
    (utils/patches.py:35,104: (k+1)^2 allocated slots)."""
    slack = grid.slack_patches
    if slack == 0:
        return patches
    pad = np.zeros((slack,) + patches.shape[1:], dtype=patches.dtype)
    return np.concatenate([patches, pad], axis=0)
