"""Headline benchmark: full Sentinel-2 L1C tile super-resolution end-to-end.

Reproduces the driver's north-star workload (BASELINE.md): both networks —
DSen2 2x (six 20 m bands -> 10 m) and DSen2_60 6x (two 60 m bands -> 10 m) —
over a full 10980x10980 tile, on however many chips are attached.

Prints ONE JSON line:
  {"metric": "sr_megapixels_per_sec_per_chip", "value": N, "unit": "MP/s/chip",
   "vs_baseline": R, ...}

Baseline R=1 corresponds to the reference target of a full tile (both nets)
in 60 s on a v5e-8: 10980^2 px / 60 s / 8 chips = 0.2512 MP/s/chip.

Timing methodology: the SR computation is timed with outputs resident on
device (a checksum forces execution), because in this dev harness the TPU is
behind a tunnel whose device->host link runs at ~20-30 MB/s — one reading of
a full-tile output would be ~3 minutes of pure tunnel artifact that no real
v5e host (PCIe/DMA, tens of GB/s) would see. The observed d2h time is still
measured once and reported separately in "d2h_seconds".

Env overrides: BENCH_SIZE (10 m grid size, default 10980; must be a multiple
of 6), BENCH_PRECISION (default "high" = bf16x3, ~3e-5 relative error;
"highest" for true-f32 parity; "default" for single-pass bf16 turbo),
BENCH_REPEATS (default 1 timed repeat after warmup), BENCH_BATCH2/BENCH_BATCH6
(patch batch sizes, defaults 64/32), BENCH_BANDED (default 1: the banded
per-band program; 0 for the one-jit whole-tile pipeline),
BENCH_DEEP_FULL=1 (measure BOTH VDSen2 heads on the FULL BENCH_SIZE tile via
the banded engine instead of the 1830^2 sub-tile extrapolation),
BENCH_DEEP_BATCH/BENCH_DEEP_BATCH6 (deep patch batches, 16/8),
BENCH_TURBO (default 1: also time one precision="default" pass — Pallas
auto-routed — and report it as the "turbo" sub-object).
"""

from __future__ import annotations

import json
import os
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", "10980"))
    precision = os.environ.get("BENCH_PRECISION", "high")
    repeats = int(os.environ.get("BENCH_REPEATS", "1"))
    assert size % 6 == 0, "BENCH_SIZE must be a multiple of 6"

    import jax

    # Persistent compilation cache dir comes from the dsen2_tpu import hook
    # (per-user, DSEN2_TPU_COMPILE_CACHE-overridable); full-tile programs
    # take minutes to compile cold, so cache even medium compiles.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dsen2_tpu.core.config import InferConfig, dsen2_2x, dsen2_6x
    from dsen2_tpu.infer.api import _run
    from dsen2_tpu.models import s2net

    n_chips = len(jax.devices())

    import jax.numpy as jnp

    # First touch of the device: in this harness the TPU sits behind a
    # pooled tunnel and a fresh process can wait MINUTES for the chip's
    # lease if another process held it recently. Measure that claim stall
    # separately so warmup_seconds reflects the framework (compile/load +
    # first execution), not the pool's weather. Synced via an actual 8-byte
    # checksum readback, not block_until_ready — the latter can return
    # before completion on this tunneled backend (docs/PERFORMANCE.md).
    t0 = time.time()
    float(jnp.sum(jnp.zeros((8,))))
    device_claim_seconds = time.time() - t0

    rng = np.random.default_rng(0)
    # uint16 inputs: the L1C source dtype, and what the SAFE reader hands
    # the API — compact staging (infer.api.stage_raster) ships the integers
    # and casts on device, halving h2d bytes vs a host-side f32 cast.
    # Outputs are bit-identical (tests/test_infer.py::TestCompactInputStaging);
    # BENCH_INPUT_DTYPE=float32 restores the old staging for comparison.
    in_dtype = np.dtype(os.environ.get("BENCH_INPUT_DTYPE", "uint16"))
    d10 = (rng.random((size, size, 4), dtype=np.float32) * 10000).astype(in_dtype)
    d20 = (rng.random((size // 2, size // 2, 6), dtype=np.float32) * 10000).astype(in_dtype)
    d60 = (rng.random((size // 6, size // 6, 2), dtype=np.float32) * 10000).astype(in_dtype)

    # Stage inputs on device once (production double-buffers host IO against
    # compute; input staging time is reported separately below).
    from dsen2_tpu.infer.api import stage_raster

    t0 = time.time()
    d10, d20, d60 = (jax.block_until_ready(stage_raster(a)) for a in (d10, d20, d60))
    h2d_seconds = time.time() - t0

    cfg2 = dsen2_2x(False)
    cfg6 = dsen2_6x(False)
    params2 = s2net.init_params(jax.random.PRNGKey(0), cfg2)
    params6 = s2net.init_params(jax.random.PRNGKey(1), cfg6)
    batch2 = int(os.environ.get("BENCH_BATCH2", "64"))
    batch6 = int(os.environ.get("BENCH_BATCH6", "32"))
    # Unset -> None (InferConfig AUTO: Pallas exactly where it measured
    # faster at the matched class); BENCH_PALLAS=1/0 forces on/off.
    _bp = os.environ.get("BENCH_PALLAS")
    use_pallas = None if _bp is None else _bp == "1"
    icfg2 = InferConfig(patch_size=128, border=8, batch_size=batch2,
                        precision=precision, use_pallas=use_pallas)
    icfg6 = InferConfig(patch_size=192, border=12, batch_size=batch6,
                        precision=precision, use_pallas=use_pallas)

    # Banded is the DEFAULT program shape (BENCH_BANDED=0 for the one-jit
    # whole-tile pipeline): steady state is within 1% of one-jit (19.8 vs
    # 20.0 s at 10980^2) but the much smaller per-band executable pays a
    # measurably tamer and less variable backend first-execution overhead
    # in this harness (docs/PERFORMANCE.md round-3/4 warmup dissection).
    banded = os.environ.get("BENCH_BANDED", "1") == "1"
    if banded:
        from dsen2_tpu.infer.engine import sr_banded

        rows_per_band = int(os.environ.get("BENCH_ROWS_PER_BAND", "16"))

        def full_tile():
            b60 = sr_banded([d10, d20, d60], 6, cfg6, params6, icfg6,
                            rows_per_band, device_output=True)
            b20 = sr_banded([d10, d20], 2, cfg2, params2, icfg2,
                            rows_per_band, device_output=True)
            return [b for b, _, _ in b20] + [b for b, _, _ in b60]

    else:
        def full_tile():
            """Both nets end-to-end, outputs resident on device; the checksum
            d2h (8 bytes) forces completion."""
            sr60 = _run([d10, d20, d60], 6, cfg6, params6, icfg6, device_output=True)
            sr20 = _run([d10, d20], 2, cfg2, params2, icfg2, device_output=True)
            return sr20, sr60

    def sync(arrs):
        return float(sum(jnp.sum(a) for a in arrs))

    # Warmup: compile + one full execution.
    t0 = time.time()
    outs = full_tile()
    checksum = sync(outs)
    warm = time.time() - t0
    assert np.isfinite(checksum), checksum

    times = []
    for _ in range(repeats):
        t0 = time.time()
        sync(full_tile())
        times.append(time.time() - t0)
    best = min(times)

    # Observed host readback (tunnel-limited here; reported, not scored).
    # Fixed ~64 MB sample so the MB/s figure is comparable across rounds
    # (the old 1024-row sample swung 674->151 s estimates on identical code
    # purely from tunnel weather + sample-size variance).
    row_mb = outs[0].shape[1] * outs[0].shape[2] * 4 / 1e6
    n_rows = min(outs[0].shape[0], max(1, int(round(64.0 / row_mb))))
    t0 = time.time()
    sr20_host = np.asarray(outs[0][:n_rows])
    d2h_sample = time.time() - t0
    d2h_mb = sr20_host.nbytes / 1e6
    total_mb = sum(a.size * 4 for a in outs) / 1e6
    d2h_est = d2h_sample / max(d2h_mb, 1e-9) * total_mb
    d2h_mbps = d2h_mb / max(d2h_sample, 1e-9)
    assert np.isfinite(sr20_host).all()

    # Turbo row: one precision="default" timed pass (Pallas AUTO-routed where
    # it measured faster) so the TPU-native-kernel axis lands in the driver
    # artifact every round, not just in docs. BENCH_TURBO=0 disables.
    turbo = None
    if os.environ.get("BENCH_TURBO", "1") == "1" and precision != "default":
        ticfg2 = InferConfig(patch_size=128, border=8, batch_size=batch2,
                             precision="default", use_pallas=use_pallas)
        ticfg6 = InferConfig(patch_size=192, border=12, batch_size=batch6,
                             precision="default", use_pallas=use_pallas)
        if banded:
            def turbo_tile():
                b60 = sr_banded([d10, d20, d60], 6, cfg6, params6, ticfg6,
                                rows_per_band, device_output=True)
                b20 = sr_banded([d10, d20], 2, cfg2, params2, ticfg2,
                                rows_per_band, device_output=True)
                return [b for b, _, _ in b20] + [b for b, _, _ in b60]
        else:
            def turbo_tile():
                sr60 = _run([d10, d20, d60], 6, cfg6, params6, ticfg6,
                            device_output=True)
                sr20 = _run([d10, d20], 2, cfg2, params2, ticfg2,
                            device_output=True)
                return sr20, sr60

        t0 = time.time()
        tsum = sync(turbo_tile())
        turbo_warm = time.time() - t0
        assert np.isfinite(tsum), tsum
        t0 = time.time()
        sync(turbo_tile())
        turbo_best = time.time() - t0
        turbo_mps = size * size / 1e6 / turbo_best / n_chips
        turbo = {
            "precision": "default",
            "use_pallas": s2net.resolve_use_pallas(use_pallas, "default"),
            "seconds_both_nets": round(turbo_best, 3),
            "warmup_seconds": round(turbo_warm, 3),
            "mp_per_sec_per_chip": round(turbo_mps, 4),
            "vs_baseline": round(
                turbo_mps / ((10980.0 * 10980.0 / 1e6) / 60.0 / 8.0), 4
            ),
        }

    # VDSen2 / VDSen2_60 (32 resblocks x 256 features, ~37.8 M params) — the
    # flagship-scale models, BOTH heads — timed device-resident on a
    # 1/6-linear tile so the deep variants have a tracked perf artifact every
    # round. ~21x the FLOPs/px of the shallow nets; extrapolated full-tile
    # seconds reported alongside. BENCH_DEEP=0 disables; BENCH_DEEP_SIZE
    # resizes; BENCH_DEEP_FULL=1 measures the full BENCH_SIZE tile through
    # the banded engine instead of extrapolating.
    deep = None
    deep_full = os.environ.get("BENCH_DEEP_FULL", "0") == "1"
    if os.environ.get("BENCH_DEEP", "1") != "0":
        from dsen2_tpu.infer.engine import sr_banded as _sr_banded

        # cap at the main tile: slicing clamps silently and would otherwise
        # inflate the reported MP/s
        dsize = size if deep_full else min(
            int(os.environ.get("BENCH_DEEP_SIZE", "1830")), size
        )
        assert dsize % 6 == 0, "BENCH_DEEP_SIZE must be a multiple of 6"
        dd10 = jax.block_until_ready(jnp.asarray(d10[:dsize, :dsize]))
        dd20 = jax.block_until_ready(jnp.asarray(d20[: dsize // 2, : dsize // 2]))
        dd60 = jax.block_until_ready(jnp.asarray(d60[: dsize // 6, : dsize // 6]))

        heads = {
            "vdsen2_2x": (
                dsen2_2x(True), [dd10, dd20], 2,
                InferConfig(
                    patch_size=128, border=8,
                    batch_size=int(os.environ.get("BENCH_DEEP_BATCH", "16")),
                    precision=precision, use_pallas=use_pallas,
                ),
            ),
            "vdsen2_60": (
                dsen2_6x(True), [dd10, dd20, dd60], 6,
                InferConfig(
                    patch_size=192, border=12,
                    batch_size=int(os.environ.get("BENCH_DEEP_BATCH6", "8")),
                    precision=precision, use_pallas=use_pallas,
                ),
            ),
        }
        deep = {}
        for hname, (dcfg, dins, dlr, dicfg) in heads.items():
            dparams = s2net.init_params(jax.random.PRNGKey(2), dcfg)

            if deep_full:
                # MEASURED full-tile through the banded engine (the program
                # shape a real 10980^2 deep run uses), not the sub-tile
                # quadratic extrapolation.
                def deep_checksum(dins=dins, dlr=dlr, dcfg=dcfg,
                                  dparams=dparams, dicfg=dicfg):
                    bands = _sr_banded(dins, dlr, dcfg, dparams, dicfg,
                                       rows_per_band=16, device_output=True)
                    return float(sum(jnp.sum(b) for b, _, _ in bands))
            else:
                def deep_checksum(dins=dins, dlr=dlr, dcfg=dcfg,
                                  dparams=dparams, dicfg=dicfg):
                    return float(jnp.sum(
                        _run(dins, dlr, dcfg, dparams, dicfg, device_output=True)
                    ))

            t0 = time.time()
            dsum = deep_checksum()
            deep_warm = time.time() - t0
            assert np.isfinite(dsum), dsum
            t0 = time.time()
            deep_checksum()
            deep_best = time.time() - t0
            deep_mp = dsize * dsize / 1e6
            head = {
                "model": f"{'VDSen2' if dlr == 2 else 'VDSen2_60'} (32x256)",
                "tile_10m_px": dsize,
                "seconds": round(deep_best, 3),
                "warmup_seconds": round(deep_warm, 3),
                "mp_per_sec_per_chip": round(deep_mp / deep_best / n_chips, 4),
            }
            if deep_full:
                head["full_tile_seconds"] = round(deep_best, 1)
            else:
                head["est_full_tile_seconds"] = round(
                    deep_best * (size / dsize) ** 2, 1
                )
            deep[hname] = head

    out_mp = (size * size) / 1e6
    value = out_mp / best / n_chips
    baseline = (10980.0 * 10980.0 / 1e6) / 60.0 / 8.0  # 0.2512 MP/s/chip
    print(
        json.dumps(
            {
                "metric": "sr_megapixels_per_sec_per_chip",
                "value": round(value, 4),
                "unit": "MP/s/chip",
                "vs_baseline": round(value / baseline, 4),
                "tile_10m_px": size,
                "seconds_both_nets": round(best, 3),
                "warmup_seconds": round(warm, 3),
                "device_claim_seconds": round(device_claim_seconds, 3),
                "h2d_seconds": round(h2d_seconds, 3),
                "d2h_seconds_est": round(d2h_est, 3),
                "d2h_mbps_sample": round(d2h_mbps, 2),
                "d2h_sample_mb": round(d2h_mb, 1),
                "n_chips": n_chips,
                "precision": precision,
                "banded": banded,
                # the value the model actually resolves (None = AUTO)
                "use_pallas": s2net.resolve_use_pallas(use_pallas, precision),
                "turbo": turbo,
                "deep": deep,
                "note": "random weights (conv timing is weight-independent); "
                "outputs scored device-resident, d2h reported separately "
                "(tunnel artifact, see docstring); honest e2e-incl-readback "
                "number: scripts/bench_e2e_readback.py",
            }
        )
    )


if __name__ == "__main__":
    main()
