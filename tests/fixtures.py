"""Synthetic-acquisition fixture generator.

Builds a fake Squid acquisition on disk: tiles cut from a known
ground-truth image at known stage positions (with optional known
sub-pixel-free integer jitter for registration tests), plus
coordinates.csv and 'acquisition parameters.json'. This is the test
pyramid foundation the reference lacked (SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

# Optics chosen so pixel_size_um is exactly 1.0:
# sensor 1.0 um / (tube 50 / (50/10 mag=10 -> f=5)) = 1.0/10 ... pick values below.
DEFAULT_ACQ_PARAMS = {
    "dx(mm)": 0.1, "dy(mm)": 0.1, "dz(um)": 1.5,
    "Nx": 2, "Ny": 2, "Nz": 1, "Nt": 1,
    "objective": {"magnification": 10, "tube_lens_f_mm": 180, "name": "10x"},
    "sensor_pixel_size_um": 10.0,
    "tube_lens_mm": 180,
    "pixel_binning": 1,
}
# pixel_size = 10.0 / (180 / (180/10)) = 10.0 / 10 = 1.0 um/px


def make_ground_truth(height: int, width: int, seed: int = 0,
                      dtype=np.uint16, gamma: float = 1.0,
                      quantize_bits: int = 0) -> np.ndarray:
    """Smooth-ish random texture with structure at several scales, so
    phase correlation has signal everywhere.

    ``gamma`` > 1 skews the histogram dark (microscopy-like: dim
    background with sparse bright structure, compressible like real
    fluorescence data); gamma=1 keeps the full-range texture.
    ``quantize_bits`` zeroes that many low bits — real microscopy
    concentrates entropy in a few noise bits over a dark background, so
    quantized texture compresses like real data (the raw per-pixel
    noise here otherwise defeats every compressor), letting benchmarks
    exercise the compressed-chunk write path.
    """
    rng = np.random.default_rng(seed)
    img = rng.random((height, width)).astype(np.float32)
    # Add multi-scale structure by summing blurred octaves. Large
    # canvases (bench fixtures: 20k-41k px) approximate the wide-sigma
    # octaves at reduced resolution — a full-res sigma-27 blur over a
    # 41k^2 f32 canvas costs tens of minutes on a starved single core,
    # and the texture only needs structure, not an exact kernel. Test
    # canvases (<= 8192 px) keep the exact blur, bit-identical to
    # before.
    big = max(height, width) > 8192
    acc = np.zeros_like(img)
    for k in (3, 9, 27):
        s = k // 3
        if big and s > 1:
            small = cv2.resize(img, (max(1, width // s), max(1, height // s)),
                               interpolation=cv2.INTER_AREA)
            b = cv2.GaussianBlur(small, (0, 0), k / s)
            b = cv2.resize(b, (width, height),
                           interpolation=cv2.INTER_LINEAR)
        else:
            b = cv2.GaussianBlur(img, (0, 0), k)
        acc += b * k
    acc += 0.3 * img
    acc -= acc.min()
    acc /= max(acc.max(), 1e-9)
    if gamma != 1.0:
        acc = acc ** gamma
    maxval = np.iinfo(dtype).max if np.issubdtype(dtype, np.integer) else 1.0
    out = (acc * maxval * 0.8 + maxval * 0.1).astype(dtype)
    if quantize_bits and np.issubdtype(dtype, np.integer):
        # mask the low bits; & max keeps the literal in the dtype's
        # unsigned range (numpy 2 rejects out-of-bounds Python ints)
        mask = ~((1 << quantize_bits) - 1) & int(np.iinfo(dtype).max)
        out &= np.array(mask, dtype)
    return out


@dataclass
class SyntheticAcquisition:
    """Description of a generated acquisition (returned to tests)."""
    input_folder: str
    ground_truth: np.ndarray
    grid_cols: int
    grid_rows: int
    tile_w: int
    tile_h: int
    overlap: int
    pixel_size_um: float
    channels: List[str]
    regions: List[str]
    timepoints: List[int]
    num_z: int
    # (region, t, row, col) -> (y0, x0) top-left of each tile in ground truth
    tile_origins: Dict[Tuple[str, int, int, int], Tuple[int, int]] = field(default_factory=dict)


def write_synthetic_acquisition(
    folder: str,
    grid_cols: int = 2,
    grid_rows: int = 2,
    tile_w: int = 512,
    tile_h: int = 512,
    overlap: int = 64,
    channels: Optional[List[str]] = None,
    regions: Optional[List[str]] = None,
    timepoints: int = 1,
    num_z: int = 1,
    dtype=np.uint16,
    jitter: int = 0,
    noise: float = 0.0,
    vignette: Optional[np.ndarray] = None,
    seed: int = 0,
    ext: str = "tiff",
    acq_params_overrides: Optional[dict] = None,
    gt_gamma: float = 1.0,
    gt_quantize_bits: int = 0,
    backlash_x: int = 0,
    rev_step_extra_x: int = 0,
) -> SyntheticAcquisition:
    """Write a synthetic acquisition folder and return its description.

    ``jitter`` shifts each tile's source window by a deterministic integer
    amount (simulating stage error, for registration tests).
    ``backlash_x`` offsets every odd row's tiles by that many pixels in x
    (simulating bidirectional S-Pattern stage backlash: reverse-direction
    rows land systematically displaced — NOT expressible by the
    reference's grid model, whose h_shift_rev only changes the
    per-column step). ``rev_step_extra_x`` instead widens odd rows'
    WITHIN-row tile spacing by that many pixels (reverse-direction
    overlap error — exactly what h_shift_rev expresses). ``vignette``
    multiplies every tile (simulating uneven illumination, for flatfield
    tests). Stage coordinates in coordinates.csv always claim the ideal
    grid spacing, like a real microscope would.
    """
    channels = channels or ["Fluorescence 488 nm Ex"]
    regions = regions or ["A1"]
    params = dict(DEFAULT_ACQ_PARAMS)
    params.update(acq_params_overrides or {})
    pixel_size_um = (params["sensor_pixel_size_um"]
                     / (params["tube_lens_mm"]
                        / (params["objective"]["tube_lens_f_mm"]
                           / params["objective"]["magnification"])))

    step_x = tile_w - overlap          # px between tile origins
    step_y = tile_h - overlap
    margin = 2 * max(jitter, 0) + abs(backlash_x) + 8
    gt_h = step_y * (grid_rows - 1) + tile_h + 2 * margin
    gt_w = (step_x * (grid_cols - 1) + tile_w + 2 * margin
            + max(0, rev_step_extra_x) * (grid_cols - 1))
    gt = make_ground_truth(gt_h, gt_w, seed=seed, dtype=dtype,
                           gamma=gt_gamma, quantize_bits=gt_quantize_bits)

    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "acquisition parameters.json"), "w") as f:
        json.dump(params, f, indent=2)

    rng = np.random.default_rng(seed + 1)
    acq = SyntheticAcquisition(
        input_folder=folder, ground_truth=gt,
        grid_cols=grid_cols, grid_rows=grid_rows,
        tile_w=tile_w, tile_h=tile_h, overlap=overlap,
        pixel_size_um=pixel_size_um, channels=channels,
        regions=regions, timepoints=list(range(timepoints)), num_z=num_z,
    )

    maxval = np.iinfo(dtype).max if np.issubdtype(dtype, np.integer) else 1.0
    for t in range(timepoints):
        tdir = os.path.join(folder, str(t))
        os.makedirs(tdir, exist_ok=True)
        rows_csv = []
        for region in regions:
            for r in range(grid_rows):
                for c in range(grid_cols):
                    fov = r * grid_cols + c
                    jy = int(rng.integers(-jitter, jitter + 1)) if jitter else 0
                    jx = int(rng.integers(-jitter, jitter + 1)) if jitter else 0
                    bx = backlash_x if (r % 2 == 1) else 0
                    sx = (step_x + rev_step_extra_x if (r % 2 == 1)
                          else step_x)
                    y0 = margin + r * step_y + jy
                    x0 = margin + c * sx + jx + bx
                    acq.tile_origins[(region, t, r, c)] = (y0, x0)
                    for z in range(num_z):
                        # stage coords claim the ideal grid (mm), 1 px = pixel_size_um
                        x_mm = (c * step_x) * pixel_size_um / 1000.0
                        y_mm = (r * step_y) * pixel_size_um / 1000.0
                        rows_csv.append({
                            "region": region, "fov": fov, "z_level": z,
                            "x (mm)": round(x_mm, 6), "y (mm)": round(y_mm, 6),
                            "z (um)": z * params["dz(um)"],
                        })
                        for ch in channels:
                            tile = gt[y0:y0 + tile_h, x0:x0 + tile_w].astype(np.float32)
                            if vignette is not None:
                                tile = tile * vignette
                            if noise:
                                tile = tile + rng.normal(0, noise * maxval, tile.shape)
                            tile = np.clip(tile, 0, maxval).astype(dtype)
                            fname = f"{region}_{fov}_{z}_{ch.replace(' ', '_')}.{ext}"
                            # uncompressed, like raw camera output (cv2
                            # defaults to LZW for .tiff)
                            flags = ([int(cv2.IMWRITE_TIFF_COMPRESSION), 1]
                                     if ext in ("tif", "tiff") else [])
                            assert cv2.imwrite(os.path.join(tdir, fname),
                                               tile, flags)
        # Dedup csv rows (channels share coordinates)
        import pandas as pd
        df = pd.DataFrame(rows_csv).drop_duplicates(
            subset=["region", "fov", "z_level"]).reset_index(drop=True)
        df.to_csv(os.path.join(tdir, "coordinates.csv"), index=False)
    return acq
