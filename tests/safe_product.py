"""Synthetic Sentinel-2 L1C SAFE product builder for the test suite:
REAL files on disk — lossless uint16 JPEG-2000 band images (Pillow /
OpenJPEG), a granule MTD_TL.xml with geocoding, and the product
MTD_MSIL1C.xml — so the GDAL-free ingestion path (data/safe_pil.py ->
read_safe -> CLI) is exercised against an actual product layout, not a
monkeypatched fake."""

from __future__ import annotations

import os

import numpy as np

ALL_BANDS = {
    10: ("B02", "B03", "B04", "B08"),
    20: ("B05", "B06", "B07", "B8A", "B11", "B12"),
    60: ("B01", "B09", "B10"),
}

_TL_XML = """<?xml version="1.0" encoding="UTF-8"?>
<n1:Level-1C_Tile_ID xmlns:n1="https://psd-14.sentinel2.eo.esa.int/PSD/S2_PDI_Level-1C_Tile_Metadata.xsd">
  <n1:Geometric_Info>
    <Tile_Geocoding metadataLevel="Brief">
      <HORIZONTAL_CS_NAME>WGS84 / UTM zone {zone}N</HORIZONTAL_CS_NAME>
      <HORIZONTAL_CS_CODE>EPSG:{epsg}</HORIZONTAL_CS_CODE>
      {sizes}
      {geopos}
    </Tile_Geocoding>
  </n1:Geometric_Info>
</n1:Level-1C_Tile_ID>
"""


def add_granule(safe, rng, h10=360, epsg=32633, ulx=399960.0, uly=5000040.0,
                tile="T33UUB", stamp="20170527T101031"):
    """Add one granule (JP2 band files + MTD_TL.xml) to an existing SAFE
    dir; returns {short_band_name: uint16 [H, W] array}. Older multi-
    granule L1C products carry several granules, possibly in different
    UTM zones — the zone-selection branch of the reference
    (s2_tiles_supres.py:115-190)."""
    assert h10 % 6 == 0
    granule = os.path.join(safe, "GRANULE", f"L1C_{tile}_A010601_{stamp}")
    img = os.path.join(granule, "IMG_DATA")
    os.makedirs(img)

    from PIL import Image

    arrays = {}
    for res, bands in ALL_BANDS.items():
        size = h10 * 10 // res
        for b in bands:
            a = (rng.random((size, size)) * 9000).astype(np.uint16)
            short = "B" + b[2] if b[1] == "0" else b
            arrays[short] = a
            Image.fromarray(a).save(
                os.path.join(img, f"{tile}_{stamp}_{b}.jp2"), irreversible=False
            )

    zone = epsg % 100
    sizes = "".join(
        f'<Size resolution="{res}"><NROWS>{h10 * 10 // res}</NROWS>'
        f"<NCOLS>{h10 * 10 // res}</NCOLS></Size>"
        for res in (10, 20, 60)
    )
    geopos = "".join(
        f'<Geoposition resolution="{res}"><ULX>{ulx}</ULX><ULY>{uly}</ULY>'
        f"<XDIM>{res}</XDIM><YDIM>-{res}</YDIM></Geoposition>"
        for res in (10, 20, 60)
    )
    with open(os.path.join(granule, "MTD_TL.xml"), "w") as f:
        f.write(_TL_XML.format(zone=zone, epsg=epsg, sizes=sizes, geopos=geopos))
    return arrays


def build_safe(root, rng, h10=360, epsg=32633, ulx=399960.0, uly=5000040.0,
               tile="T33UUB", stamp="20170527T101031"):
    """Create `<root>/S2A_MSIL1C_..._{tile}.SAFE` and return
    (mtd_msil1c_xml_path, {short_band_name: uint16 [H, W] array})."""
    safe = os.path.join(
        str(root), f"S2A_MSIL1C_{stamp}_N0205_R122_{tile}_{stamp}.SAFE"
    )
    arrays = add_granule(safe, rng, h10=h10, epsg=epsg, ulx=ulx, uly=uly,
                         tile=tile, stamp=stamp)

    mtd = os.path.join(safe, "MTD_MSIL1C.xml")
    with open(mtd, "w") as f:
        f.write(
            '<?xml version="1.0"?><n1:Level-1C_User_Product '
            'xmlns:n1="https://psd-14.sentinel2.eo.esa.int/PSD/'
            'S2_PDI_Level-1C_Datastrip_Metadata.xsd"/>'
        )
    return mtd, arrays
