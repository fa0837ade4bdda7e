"""Real-camera tile geometries end-to-end.

Production cameras ship 1000x1000 (some sCMOS crops) and 1920x1200
(IMX249-class) tiles — neither a multiple of the TPU's 128-lane tiling
and one of them non-square. The kernels must serve these shapes, not
just the 2^n fixtures: VERDICT r3 #7 lifted the Pallas tw%128
restriction by internal lane padding; this file pins the full pipeline
(registration + flatfield + fusion + pyramid) at those shapes and the
host/device byte contract the power-of-two tests already enjoy.
"""
import glob
import os

import numpy as np
import pytest

from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array

from fixtures import write_synthetic_acquisition


def _run(acq_dir, **opts):
    stitch(acq_dir, options=EngineOptions(**opts))
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr", "0")
    return np.asarray(open_zarr_array(zp).read().result())


@pytest.mark.parametrize("tw,th", [(250, 250), (480, 300)])
def test_camera_shape_host_device_identical(tmp_path, rng, tw, th):
    """Non-128-multiple (and non-square) tiles: host and device fusion
    must stay byte-identical through the full registered pipeline.
    Shapes are 1/4-scale stand-ins for 1000^2 / 1920x1200 (same
    remainders mod 128 are NOT preserved — that's fine, the property
    under test is 'not a lane multiple', which both keep)."""
    results = {}
    for backend in ("host", "device"):
        acq = str(tmp_path / f"acq_{tw}x{th}_{backend}")
        write_synthetic_acquisition(acq, grid_cols=3, grid_rows=2,
                                    tile_w=tw, tile_h=th,
                                    overlap=max(24, tw // 10))
        results[backend] = _run(acq, fusion_device=backend,
                                fusion_batch=4)
    np.testing.assert_array_equal(results["host"], results["device"])


def test_full_scale_1920x1200_e2e(tmp_path):
    """One full-scale IMX249-shaped run (2x2 grid, registration +
    flatfield): canvas dims follow the geometry model, content covers
    the canvas, pyramid level 1 exists and halves both axes."""
    acq = str(tmp_path / "imx249")
    write_synthetic_acquisition(acq, grid_cols=2, grid_rows=2,
                                tile_w=1920, tile_h=1200, overlap=192)
    stitch(acq, options=EngineOptions(fusion_device="host"),
           use_registration=True, apply_flatfield=True)
    out = sorted(glob.glob(acq + "_stitched_*"))[-1]
    zroot = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr")
    lv0 = np.asarray(open_zarr_array(
        os.path.join(zroot, "0")).read().result())
    assert lv0.shape[-1] > 1920 and lv0.shape[-2] > 1200
    assert (lv0 != 0).mean() > 0.9
    lv1 = np.asarray(open_zarr_array(
        os.path.join(zroot, "1")).read().result())
    assert lv1.shape[-2:] == (lv0.shape[-2] // 2, lv0.shape[-1] // 2)
