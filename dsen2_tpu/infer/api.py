"""DSen2 inference API: numpy HWC in -> numpy HWC out.

Drop-in capability match for the reference inference API
(testing/supres.py:15-50: DSen2_20 / DSen2_60), rebuilt as ONE jitted TPU
program per image geometry:

    symmetric pad -> per-chunk halo-patch gather -> per-patch bilinear
    LR->HR upsample (MXU matmul) -> residual CNN -> border-crop ->
    last-write-wins mosaic scatter

The whole pipeline streams over patch chunks with `lax.scan`, so HBM holds
only the padded inputs, one chunk of activations, and the output mosaic —
a full 10980x10980 L1C tile fits a single chip. Patch geometry matches the
reference exactly (patch 128 / border 8 on the 10 m grid for 2x,
192 / 12 for 6x; testing/supres.py:21-22,40-41).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dsen2_tpu.core.bands import SCALE
from dsen2_tpu.core.config import InferConfig, ModelConfig, dsen2_2x, dsen2_6x
from dsen2_tpu.models import s2net
from dsen2_tpu.ops.resize import upsample_patches
from dsen2_tpu.ops.tiling import PatchGrid, recompose_positions

__all__ = [
    "dsen2_20", "dsen2_60", "sr_pipeline", "sr_tile", "build_grids",
    "stage_raster", "staging_dtype",
]

# Host-output tiles at least this many 10 m pixels route through the banded
# engine (readback overlap + per-band executables); the device-resident
# ensemble reuses it to pick banded program shapes for large tiles.
_BANDED_THRESHOLD_PX = 3000 * 3000


def build_grids(
    shapes: Sequence[Tuple[int, ...]], lr_factor: int, infer_cfg: InferConfig
) -> Tuple[PatchGrid, ...]:
    """Per-raster patch grids for finest-first raster shapes ((H, W[, C])).
    The grid lives on the coarsest raster (reference utils/patches.py:32-33
    for 2x, :101-102 for 6x) and is scaled up to each finer one. Single
    source of truth for every pipeline (one-shot, banded, sharded, cache
    warming) — the compiled HLO is keyed on these geometries."""
    h10 = shapes[0][0]
    p_hr, b_hr = infer_cfg.patch_size, infer_cfg.border
    g_coarse = PatchGrid(
        shapes[-1][0], shapes[-1][1], p_hr // lr_factor, b_hr // lr_factor
    )
    factors = [lr_factor // (h10 // s[0]) for s in shapes]
    return tuple(g_coarse.scaled(f) for f in factors)


def _pad_to_multiple(arr: np.ndarray, mult: int) -> np.ndarray:
    n = arr.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)], axis=0)


# Rasters in these dtypes are exact in float32, so they ship to the device
# AS-IS and are cast there (the jitted pipeline's first op is an
# astype(compute_dtype)) — half the h2d bytes of a host-side float32 cast.
# Sentinel-2 L1C source data is uint16 and the reference reads it unchanged
# (testing/s2_tiles_supres.py:368 ReadAsArray), so compact staging is the
# production input path, not a special case; outputs are bit-identical.
_COMPACT_STAGE_DTYPES = tuple(
    np.dtype(t) for t in (np.uint8, np.int8, np.uint16, np.int16, np.float16)
) + (np.dtype(jnp.bfloat16),)


def staging_dtype(dtype) -> np.dtype:
    """The dtype a raster of `dtype` should cross h2d as: itself when the
    values embed exactly in float32 (compact staging), float32 otherwise.
    Single source of truth for every staging site (stage_raster and the
    mesh paths in parallel/inference.py)."""
    dt = np.dtype(dtype)
    return dt if dt in _COMPACT_STAGE_DTYPES else np.dtype(np.float32)


def stage_raster(r) -> jax.Array:
    """Move one host raster to device with minimal transfer bytes: dtypes
    that embed exactly in float32 ship unconverted (2 bytes/px for the
    uint16 L1C source instead of 4), everything else stages as float32.
    Device arrays pass through untouched."""
    if isinstance(r, jax.Array):
        return r
    a = np.ascontiguousarray(np.asarray(r))
    return jnp.asarray(a, staging_dtype(a.dtype))


def sr_tile(
    params,
    inputs: Tuple[jax.Array, ...],
    starts: jax.Array,  # [nb, B, n_inputs, 2] per-chunk per-input patch starts
    positions: jax.Array,  # [nb, B, 2] output-space interior positions
    *,
    cfg: ModelConfig,
    infer_cfg: InferConfig,
    grids: Tuple[PatchGrid, ...],
    out_hw: Tuple[int, int],
    out_dtype=None,  # None -> infer_cfg.output_dtype
    pad_inputs: bool = True,
) -> jax.Array:
    """Fused tiled super-resolution over `inputs` (HWC rasters, one per
    resolution, finest first). Returns the [H, W, C_out] mosaic. Pure
    trace-time function — jit via sr_pipeline, or map it inside shard_map
    (dsen2_tpu.parallel.inference) for multi-tile fleets.

    pad_inputs=False: inputs already carry their symmetric halo (the
    single-tile mesh path pre-pads on host and ships each shard only its
    window); `starts` must then be padded-coordinate."""
    p_hr = infer_cfg.patch_size
    border = infer_cfg.border
    interior = p_hr - 2 * border
    if out_dtype is None:
        out_dtype = jnp.dtype(infer_cfg.output_dtype)
    out_dtype = jnp.dtype(out_dtype)
    compute_dtype = jnp.dtype(infer_cfg.compute_dtype)
    if compute_dtype != jnp.float32:
        # Turbo path: bf16 activations AND params halve HBM traffic through
        # the conv stack; accumulation stays f32 inside the MXU.
        params = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)

    # Pad every raster with its halo once; stays in HBM across the scan.
    padded = []
    for img, g in zip(inputs, grids):
        if pad_inputs:
            b = g.border
            img = jnp.pad(
                img.astype(compute_dtype), ((b, b), (b, b), (0, 0)), mode="symmetric"
            )
        else:
            img = img.astype(compute_dtype)
        padded.append(img)

    inv_scale = jnp.asarray(1.0 / SCALE, compute_dtype)

    def gather_chunk(chunk_starts):
        """chunk_starts: [B, n_inputs, 2] -> tuple of [B, p, p, C] patches."""
        outs = []
        for idx, (pad_img, g) in enumerate(zip(padded, grids)):
            c = pad_img.shape[-1]

            def one(st, pad_img=pad_img, p=g.patch, c=c):
                return jax.lax.dynamic_slice(pad_img, (st[0], st[1], 0), (p, p, c))

            outs.append(jax.vmap(one)(chunk_starts[:, idx]))
        return tuple(outs)

    def chunk_step(mosaic, xs):
        chunk_starts, chunk_pos = xs
        patches = gather_chunk(chunk_starts)
        # LR inputs -> HR grid via the reference's per-patch bilinear map.
        net_in = [patches[0] * inv_scale]
        for p_lr in patches[1:]:
            net_in.append(upsample_patches(p_lr, (p_hr, p_hr)) * inv_scale)
        pred = s2net.apply(params, net_in, cfg, precision=infer_cfg.precision,
                           use_pallas=infer_cfg.use_pallas)
        pred = pred.astype(jnp.float32) * jnp.asarray(SCALE, jnp.float32)
        interiors = pred[:, border : p_hr - border, border : p_hr - border, :]
        if jnp.issubdtype(out_dtype, jnp.integer):
            info = jnp.iinfo(out_dtype)
            interiors = jnp.clip(jnp.round(interiors), info.min, info.max)
        interiors = interiors.astype(mosaic.dtype)

        def write(img, wxs):
            patch, yx = wxs
            return jax.lax.dynamic_update_slice(img, patch, (yx[0], yx[1], 0)), None

        mosaic, _ = jax.lax.scan(write, mosaic, (interiors, chunk_pos))
        return mosaic, None

    # Seed the mosaic with a zero DERIVED from the input so its shard_map
    # varying-axes type matches the per-shard writes (a plain zeros constant
    # is "unvarying" and the write scan would type-mismatch under shard_map;
    # outside shard_map this folds to a broadcast add of 0).
    zero = (inputs[0].reshape(-1)[0] * 0).astype(out_dtype)
    mosaic0 = jnp.zeros((out_hw[0], out_hw[1], cfg.out_channels), dtype=out_dtype) + zero
    mosaic, _ = jax.lax.scan(chunk_step, mosaic0, (starts, positions))
    return mosaic


sr_pipeline = functools.partial(
    jax.jit,
    static_argnames=("cfg", "infer_cfg", "grids", "out_hw", "out_dtype", "pad_inputs"),
)(sr_tile)


def _prepare_schedule(
    grids: Sequence[PatchGrid], out_hw: Tuple[int, int], interior: int, batch: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host-side static schedule: per-chunk patch starts for every input
    raster plus output positions, padded to whole chunks by repeating the
    final patch (a duplicate write of identical content — harmless)."""
    starts_per_input = [g.flat_starts() for g in grids]
    n = starts_per_input[0].shape[0]
    for s in starts_per_input:
        assert s.shape[0] == n, "all rasters must share the patch grid"
    pos = recompose_positions(out_hw, interior)
    assert pos.shape[0] == n, (pos.shape[0], n)

    stacked = np.stack(starts_per_input, axis=1)  # [N, n_inputs, 2]
    stacked = _pad_to_multiple(stacked, batch)
    pos = _pad_to_multiple(pos, batch)
    nb = stacked.shape[0] // batch
    starts = stacked.reshape(nb, batch, len(grids), 2)
    positions = pos.reshape(nb, batch, 2)
    return starts, positions, nb


def _validate_inputs(
    rasters: Sequence[np.ndarray], lr_factor: int, cfg: ModelConfig, infer_cfg: InferConfig
) -> None:
    names = ("d10", "d20", "d60")[: len(rasters)]
    h10, w10 = rasters[0].shape[:2]
    for r, name, want_c in zip(rasters, names, cfg.in_channels):
        if r.ndim != 3:
            raise ValueError(f"{name}: expected an HWC array, got shape {r.shape}")
        if r.shape[-1] != want_c:
            raise ValueError(
                f"{name}: expected {want_c} bands (got {r.shape[-1]}); band order "
                "follows testing/supres.py:16-18,34-37 of the reference"
            )
        down = h10 // r.shape[0]
        if down * r.shape[0] != h10 or down * r.shape[1] != w10 or lr_factor % max(down, 1):
            raise ValueError(
                f"{name} shape {r.shape[:2]} does not align with the 10m grid "
                f"({h10}x{w10}): each raster must be an integer 1/2 or 1/6 of it"
            )
    # Every raster, once halo-padded, must hold at least one patch.
    g_lr_patch = infer_cfg.patch_size // lr_factor
    g_lr_border = infer_cfg.border // lr_factor
    min_lr = g_lr_patch - 2 * g_lr_border
    if rasters[-1].shape[0] < min_lr or rasters[-1].shape[1] < min_lr:
        raise ValueError(
            f"image too small for patch_size={infer_cfg.patch_size}/"
            f"border={infer_cfg.border}: the coarsest raster is "
            f"{rasters[-1].shape[:2]} but must be at least {min_lr}x{min_lr}; "
            "pass a smaller InferConfig.patch_size"
        )


def _run(
    rasters: Sequence[np.ndarray],
    lr_factor: int,
    cfg: ModelConfig,
    params,
    infer_cfg: InferConfig,
    device_output: bool = False,
    mesh=None,
) -> np.ndarray:
    """Shared driver for the 2x/6x paths. rasters: finest-first HWC numpy.
    With device_output=True the mosaic stays on device (callers that chain
    further device work or overlap host readback use this). Large host-bound
    outputs route through the banded engine so readback overlaps compute
    (measured 19% faster end to end on 5490^2, bit-identical). With a mesh,
    the single tile's grid rows shard over the mesh 'data' axis
    (parallel.inference.sr_tile_sharded), one output band per device."""
    if mesh is not None and mesh.devices.size > 1:
        if device_output:
            raise ValueError(
                "device_output=True is not supported with a multi-device "
                "mesh: sr_tile_sharded assembles the mosaic on host "
                "(per-shard bands are gathered as numpy). Drop device_output "
                "or run without a mesh."
            )
        from dsen2_tpu.parallel.inference import sr_tile_sharded

        return sr_tile_sharded(params, rasters, lr_factor, cfg, infer_cfg, mesh)
    _validate_inputs(rasters, lr_factor, cfg, infer_cfg)

    if (
        not device_output
        and rasters[0].shape[0] * rasters[0].shape[1] >= _BANDED_THRESHOLD_PX
    ):
        from dsen2_tpu.infer.engine import sr_banded

        return sr_banded(rasters, lr_factor, cfg, params, infer_cfg)
    h10, w10 = rasters[0].shape[:2]
    p_hr, b_hr = infer_cfg.patch_size, infer_cfg.border
    grids = build_grids([r.shape for r in rasters], lr_factor, infer_cfg)

    interior = p_hr - 2 * b_hr
    batch = min(infer_cfg.batch_size, grids[0].num_patches)
    starts, positions, _ = _prepare_schedule(grids, (h10, w10), interior, batch)

    out = sr_pipeline(
        params,
        tuple(stage_raster(r) for r in rasters),
        jnp.asarray(starts),
        jnp.asarray(positions),
        cfg=cfg,
        infer_cfg=infer_cfg,
        grids=grids,
        out_hw=(h10, w10),
    )
    if device_output:
        return out
    return np.asarray(out)


@functools.partial(jax.jit, static_argnames=("k", "f"), donate_argnums=(0,))
def _ens_add_band(acc, stripe, idx, *, k, f):
    """Add one band of a dihedral-transformed SR mosaic into the
    output-space f32 accumulator. The band covers rows [y0, y0+h) of the
    TRANSFORMED mosaic; under the inverse transform it lands as a
    contiguous row-stripe (k even) or column-stripe (k odd) of output
    space, so no full per-transform mosaic is ever materialized. `idx` is
    the stripe's start row/column (traced, so every band of the same shape
    reuses one compiled program); k/f encode the forward transform
    (ops/dihedral.py: k quarter-turns then flip along axis 0 iff f)."""
    s = jnp.flip(stripe, axis=0) if f else stripe
    s = s.astype(jnp.float32)
    # Inverse transform = rot90(.., -k) after undoing the flip; applied to
    # the stripe it is a +/-90/180 rotation of the stripe content.
    content = jnp.rot90(s, -k, axes=(0, 1))
    zero = jnp.zeros((), idx.dtype)
    start = (idx, zero, zero) if k % 2 == 0 else (zero, idx, zero)
    cur = jax.lax.dynamic_slice(acc, start, content.shape)
    return jax.lax.dynamic_update_slice(acc, cur + content, start)


def _ens_accumulate_bands(acc, bands, code):
    """Fold one dihedral transform's banded SR output into the accumulator,
    band by band (bounded HBM: the accumulator + at most ~2 in-flight bands
    are resident — never a full transformed mosaic). bands: iterable of
    (device_array, y0, band_h) in the TRANSFORMED mosaic's row space."""
    k, f = code % 4, code >= 4
    h_out, w_out = acc.shape[:2]
    rows_tr = h_out if k % 2 == 0 else w_out  # rows of the transformed mosaic
    for band, y0, h in bands:
        a = rows_tr - y0 - h if f else y0  # stripe start after un-flipping
        # After rot90(.., -k) the stripe starts at:
        #   k=0: row a    k=1: col rows_tr-a-h    k=2: row rows_tr-a-h
        #   k=3: col a
        idx = a if k in (0, 3) else rows_tr - a - h
        acc = _ens_add_band(acc, band, jnp.asarray(idx, jnp.int32), k=k, f=f)
    return acc


def _run_ensembled(rasters, lr_factor, cfg, params, infer_cfg, mesh=None):
    """Geometric self-ensemble: run the pipeline on all 8 dihedral
    transforms of the input rasters, invert each prediction, average.
    A standard SR accuracy boost at 8x the compute — for
    orientation-robust weights (augmented / multi-tile training); with
    orientation-overfit weights it can hurt (measured numbers in
    models/README.md). The reference offers nothing comparable.

    Device-resident: the rasters are staged to HBM ONCE, the 8 dihedral
    transforms and the running f32 sum live on device, and the host reads
    back a single averaged mosaic (one d2h transfer instead of 8 — the
    transfer is the bottleneck on tunneled harnesses). Non-square tiles
    compile a second (transposed) geometry for the odd rotations.
    `infer_cfg.output_dtype` quantization is applied ONCE to the final mean
    (not per transform), so uint16 ensembles carry no compounded rounding.

    HBM is bounded at production scale: large tiles run the banded engine
    and every band is folded straight into the f32 accumulator
    (_ens_accumulate_bands) — resident extras are the accumulator
    (H*W*C_out*4 B: ~2.9 GB for a 10980^2 2x run, ~0.96 GB for 6x) plus
    ~2 in-flight bands and one transformed input copy; no per-transform
    full mosaic exists at any point. Measured full-tile numbers:
    docs/PERFORMANCE.md §Self-ensemble. With a multi-device mesh the
    per-transform mosaics are assembled on host (sr_tile_sharded) and
    averaged there instead."""
    from dsen2_tpu.ops.dihedral import dihedral_np, dihedral_static, inverse_code

    out_dtype = jnp.dtype(
        infer_cfg.output_dtype if infer_cfg is not None else "float32"
    )  # np.dtype (bf16 via ml_dtypes)

    f32_cfg = (
        dataclasses.replace(infer_cfg, output_dtype="float32")
        if infer_cfg is not None
        else None
    )

    if mesh is not None and mesh.devices.size > 1:
        # Sharded path, device-resident: each transform's per-shard output
        # bands stay on the mesh and fold into the f32 accumulator through
        # the same stripe math as the banded single-device path (a shard's
        # band IS a row band of the transformed mosaic), so the host reads
        # back ONE averaged mosaic instead of 8 (inputs are transformed on
        # host — the window decomposition is orientation-dependent).
        from dsen2_tpu.parallel.inference import sr_tile_sharded

        h10, w10 = rasters[0].shape[:2]
        acc = jnp.zeros((h10, w10, cfg.out_channels), jnp.float32)
        for code in range(8):
            tr = [dihedral_np(np.asarray(r), code) for r in rasters]
            result, band_meta = sr_tile_sharded(
                params, tr, lr_factor, cfg, f32_cfg, mesh, device_result=True
            )
            bands = (
                (result[s, :h], y0, h)
                for s, (y0, h) in enumerate(band_meta)
                if h
            )
            acc = _ens_accumulate_bands(acc, bands, code)
        mean = acc / 8.0
        if jnp.issubdtype(out_dtype, jnp.integer):
            info = jnp.iinfo(out_dtype)
            mean = jnp.clip(jnp.round(mean), info.min, info.max)
        return np.asarray(mean.astype(out_dtype))

    dev = [stage_raster(r) for r in rasters]
    h10, w10 = int(dev[0].shape[0]), int(dev[0].shape[1])
    large = h10 * w10 >= _BANDED_THRESHOLD_PX

    acc = (
        jnp.zeros((h10, w10, cfg.out_channels), jnp.float32) if large else None
    )
    for code in range(8):
        tr = [dihedral_static(r, code) for r in dev]
        if large:
            # Banded per-band programs (tamer first execution than the
            # one-jit whole-tile executable — same reason bench.py defaults
            # to banded), folded into the accumulator as produced.
            from dsen2_tpu.infer.engine import sr_banded

            bands = sr_banded(tr, lr_factor, cfg, params, f32_cfg,
                              device_output=True)
            acc = _ens_accumulate_bands(acc, bands, code)
        else:
            sr = _run(tr, lr_factor, cfg, params, f32_cfg, device_output=True)
            back = dihedral_static(jnp.asarray(sr, jnp.float32),
                                   inverse_code[code])
            acc = back if acc is None else acc + back
    mean = acc / 8.0
    if jnp.issubdtype(out_dtype, jnp.integer):
        info = jnp.iinfo(out_dtype)
        mean = jnp.clip(jnp.round(mean), info.min, info.max)
    return np.asarray(mean.astype(out_dtype))


def dsen2_20(
    d10: np.ndarray,
    d20: np.ndarray,
    deep: bool = False,
    params=None,
    infer_cfg: Optional[InferConfig] = None,
    mesh=None,
    ensemble: bool = False,
) -> np.ndarray:
    """Super-resolve the six 20 m bands to 10 m.

    d10: [H, W, 4] (B2, B3, B4, B8); d20: [H/2, W/2, 6]
    (B5, B6, B7, B8A, B11, B12) — reference testing/supres.py:15-30.
    With mesh, ONE tile's patch grid shards over the mesh's 'data' axis.
    ensemble=True averages over the 8 dihedral transforms (8x compute;
    an accuracy boost for orientation-robust weights)."""
    cfg = dsen2_2x(deep)
    infer_cfg = infer_cfg or InferConfig(patch_size=128, border=8)
    if params is None:
        from dsen2_tpu.weights import default_params

        params = default_params(cfg, run_60=False, deep=deep)
    run = _run_ensembled if ensemble else _run
    return run([d10, d20], 2, cfg, params, infer_cfg, mesh=mesh)


def dsen2_60(
    d10: np.ndarray,
    d20: np.ndarray,
    d60: np.ndarray,
    deep: bool = False,
    params=None,
    infer_cfg: Optional[InferConfig] = None,
    mesh=None,
    ensemble: bool = False,
) -> np.ndarray:
    """Super-resolve the two 60 m bands (B1, B9) to 10 m
    (reference testing/supres.py:33-50: patch 192, border 12).
    With mesh, ONE tile's patch grid shards over the mesh's 'data' axis.
    ensemble=True averages over the 8 dihedral transforms (8x compute)."""
    cfg = dsen2_6x(deep)
    infer_cfg = infer_cfg or InferConfig(patch_size=192, border=12)
    if params is None:
        from dsen2_tpu.weights import default_params

        params = default_params(cfg, run_60=True, deep=deep)
    run = _run_ensembled if ensemble else _run
    return run([d10, d20, d60], 6, cfg, params, infer_cfg, mesh=mesh)
