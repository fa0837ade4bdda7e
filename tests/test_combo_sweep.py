"""Randomized parameter-combination e2e sweep.

Every individual feature has a focused test; interaction bugs live in
the combinations nobody wrote one for (reference context: the three
reference editions diverged precisely in untested combinations —
SURVEY.md §2c). Each seed deterministically derives one combo across
the user-facing parameter space (scan pattern, registration scope,
blend, flatfield, format, zarr version, pyramid mode, compressor,
grid/z/t shape, streaming), runs the full engine, and asserts the
output tree is present, readable, and substantially non-empty.

Failures reproduce exactly: the seed IS the combo.
"""

import glob
import os
import random

import numpy as np
import pytest

from image_stitcher_tpu import EngineOptions, StitchingParameters
from image_stitcher_tpu.models.pipeline import StitchPipeline
from image_stitcher_tpu.io.zarr_store import open_zarr_array

from fixtures import write_synthetic_acquisition


def _combo(seed: int):
    rng = random.Random(seed)
    fmt = rng.choice(['.ome.zarr', '.ome.zarr', '.ome.tiff'])
    use_reg = rng.random() < 0.7
    combo = dict(
        fmt=fmt,
        scan_pattern=rng.choice(['Unidirectional', 'S-Pattern']),
        use_registration=use_reg,
        registration_scope=(rng.choice(['center', 'all-pairs', 'global'])
                            if use_reg else 'center'),
        apply_flatfield=rng.random() < 0.5,
        blend_method=rng.choice(['overwrite', 'feather']),
        pyramid_downsample=rng.choice(['nearest', 'mean']),
        zarr_format=rng.choice([2, 3]) if fmt == '.ome.zarr' else 2,
        compressor=rng.choice(['lz4', 'zstd', 'auto']),
        grid=rng.choice([(2, 2), (3, 2)]),
        num_z=rng.choice([1, 2]),
        timepoints=rng.choice([1, 2]),
        channels=rng.choice([1, 2]),
        force_streaming=rng.random() < 0.4,
        subpixel=False,
        merge_timepoints=False,
    )
    if combo['registration_scope'] == 'global':
        combo['subpixel'] = rng.random() < 0.5
    # always merge when the shape allows it — a coin flip here left the
    # merge path uncovered across whole seed ranges
    if combo['fmt'] == '.ome.zarr' and combo['timepoints'] > 1:
        combo['merge_timepoints'] = True
    return combo


@pytest.mark.parametrize("seed", range(20))
def test_combo_runs_and_output_is_sane(tmp_path, seed):
    c = _combo(seed)
    acq_dir = str(tmp_path / "acq")
    chans = ["Fluorescence 488 nm Ex", "Fluorescence 561 nm Ex"][:c['channels']]
    cols, rows = c['grid']
    write_synthetic_acquisition(
        acq_dir, grid_cols=cols, grid_rows=rows, tile_w=96, tile_h=96,
        overlap=24, channels=chans, timepoints=c['timepoints'],
        num_z=c['num_z'], jitter=2 if c['use_registration'] else 0,
        seed=seed)
    params = StitchingParameters(
        input_folder=acq_dir, output_format=c['fmt'],
        scan_pattern=c['scan_pattern'],
        use_registration=c['use_registration'],
        apply_flatfield=c['apply_flatfield'],
        merge_timepoints=c['merge_timepoints'])
    options = EngineOptions(
        registration_scope=c['registration_scope'],
        blend_method=c['blend_method'],
        pyramid_downsample=c['pyramid_downsample'],
        zarr_format=c['zarr_format'],
        compressor_cname=c['compressor'],
        subpixel_placement=c['subpixel'],
        streaming=('on' if c['force_streaming'] else 'auto'),
        streaming_threshold_bytes=(1 << 16 if c['force_streaming']
                                   else 256 << 20))
    StitchPipeline(params, options).run()

    outs = glob.glob(acq_dir + "_stitched_*")
    assert outs, f"combo {c}: no output folder"
    out = sorted(outs)[-1]
    for t in range(c['timepoints']):
        tdir = os.path.join(out, f"{t}_stitched")
        if c['fmt'] == '.ome.tiff':
            tiffs = glob.glob(os.path.join(tdir, "*_stitched.ome.tiff"))
            assert tiffs, f"combo {c}: no tiff for t={t}"
            assert os.path.getsize(tiffs[0]) > 1024
            from PIL import Image
            with Image.open(tiffs[0]) as im:
                # EVERY c/z page, not just the first: regressions that
                # blank later pages (or break their dtype) must fail
                n_main = len(chans) * c['num_z']
                for page in range(n_main):
                    im.seek(page)
                    arr = np.asarray(im)
                    assert arr.dtype == np.uint16, f"combo {c} page {page}"
                    assert (arr > 0).mean() > 0.3, \
                        f"combo {c}: empty tiff page {page}"
        else:
            zarrs = glob.glob(os.path.join(tdir, "*_stitched.ome.zarr"))
            assert zarrs, f"combo {c}: no zarr for t={t}"
            data = np.asarray(
                open_zarr_array(os.path.join(zarrs[0], "0")).read().result())
            assert data.dtype == np.uint16
            assert data.shape[1] == len(chans)
            assert data.shape[2] == c['num_z']
            assert (data[0, 0, 0] > 0).mean() > 0.3, \
                f"combo {c}: near-empty canvas"
    if c['merge_timepoints']:
        merged = glob.glob(os.path.join(out, "*_time_series*"))
        assert merged, f"combo {c}: merge_timepoints produced no output"


# Hand-picked combos the seeded sweep under-samples (ADVICE r4):
# subpixel placement x tiff output, and subpixel x forced streaming.
@pytest.mark.parametrize("fmt,force_streaming", [
    ('.ome.tiff', False),
    ('.ome.zarr', True),
])
def test_subpixel_combo_coverage(tmp_path, fmt, force_streaming):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=2,
                                tile_w=96, tile_h=96, overlap=24,
                                jitter=2, seed=77)
    params = StitchingParameters(input_folder=acq_dir, output_format=fmt,
                                 use_registration=True)
    options = EngineOptions(
        registration_scope='global', subpixel_placement=True,
        blend_method='feather',
        streaming=('on' if force_streaming else 'auto'),
        streaming_threshold_bytes=(1 << 16 if force_streaming
                                   else 256 << 20))
    StitchPipeline(params, options).run()
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    tdir = os.path.join(out, "0_stitched")
    if fmt == '.ome.tiff':
        from PIL import Image
        tiffs = glob.glob(os.path.join(tdir, "*_stitched.ome.tiff"))
        assert tiffs
        with Image.open(tiffs[0]) as im:
            arr = np.asarray(im)
        assert arr.dtype == np.uint16 and (arr > 0).mean() > 0.3
    else:
        zarrs = glob.glob(os.path.join(tdir, "*_stitched.ome.zarr"))
        data = np.asarray(
            open_zarr_array(os.path.join(zarrs[0], "0")).read().result())
        assert data.dtype == np.uint16 and (data[0, 0, 0] > 0).mean() > 0.3
