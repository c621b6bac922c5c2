"""Sentinel-2 band specifications and global constants.

Capability parity with the reference DSen2 stack:
  - reflectance scale constant (reference: testing/supres.py:11, training/supres_train.py:24)
  - band orders expected by the networks (reference: testing/supres.py:16-18,34-37)
  - band whitelists used by the full-tile CLI (reference: testing/s2_tiles_supres.py:81-84)
"""

from __future__ import annotations

import dataclasses

# Reflectance values are divided by SCALE before the network and multiplied back
# after (reference: testing/supres.py:11,23-24,29).
SCALE = 2000.0

# The per-patch bilinear pre-interpolation normalises by this constant
# (reference: utils/patches.py:15).
INTERP_NORM = 30000.0

# Band order conventions (reference: testing/supres.py:16-18,34-37).
BANDS_10M = ("B2", "B3", "B4", "B8")
BANDS_20M = ("B5", "B6", "B7", "B8A", "B11", "B12")
BANDS_60M = ("B1", "B9")  # never B10 (too noisy; reference s2_tiles_supres.py:37-38)

# Band selections for full-tile processing (reference: testing/s2_tiles_supres.py:81-84).
SELECT_BANDS_20 = ("B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B11", "B12")
SELECT_BANDS_60 = ("B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9", "B11", "B12")


@dataclasses.dataclass(frozen=True)
class TileSpec:
    """Geometry of the three Sentinel-2 resolutions for one region of interest.

    All sizes are in pixels of the respective grid; the 10 m grid is the
    reference. Invariant: h10 = 2*h20 = 6*h60 (ROI snapping to 6-px boundaries
    on the 10 m grid guarantees this; reference s2_tiles_supres.py:130-134).
    """

    h10: int
    w10: int

    @property
    def h20(self) -> int:
        return self.h10 // 2

    @property
    def w20(self) -> int:
        return self.w10 // 2

    @property
    def h60(self) -> int:
        return self.h10 // 6

    @property
    def w60(self) -> int:
        return self.w10 // 6

    def validate(self) -> None:
        if self.h10 % 6 or self.w10 % 6:
            raise ValueError(
                f"10m grid ({self.h10}x{self.w10}) must be a multiple of 6 so the "
                "20m/60m grids align (ROI snapping rule)"
            )
