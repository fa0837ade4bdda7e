"""Subpixel placement: fractional solve residuals applied at load time."""

import glob
import os

import numpy as np

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.readers import TileJob, load_tile_plane
from image_stitcher_tpu.io.zarr_store import open_zarr_array


def test_loader_warp_mechanics(tmp_path):
    """A half-pixel shift of a linear ramp averages adjacent samples."""
    import cv2
    ramp = np.tile(np.arange(0, 6400, 100, np.uint16), (32, 1))  # 32x64
    p = str(tmp_path / "r.tiff")
    cv2.imwrite(p, ramp, [int(cv2.IMWRITE_TIFF_COMPRESSION), 1])
    plain = load_tile_plane(TileJob(p, -1, 0, 0, 0, 0, (0, 0, 0, 0)))
    np.testing.assert_array_equal(plain, ramp)
    shifted = load_tile_plane(TileJob(p, -1, 0, 0, 0, 0, (0, 0, 0, 0),
                                      fy=0.0, fx=0.5))
    # content moves +0.5 px in x: interior value = mean of neighbors
    np.testing.assert_allclose(shifted[16, 10:50],
                               (ramp[16, 9:49].astype(float)
                                + ramp[16, 10:50]) / 2, atol=1.0)


def test_subpixel_e2e_not_worse(tmp_path):
    """On an integer-jitter fixture the fractional residuals are ~0, so
    subpixel mode must reproduce (nearly) the integer-mode output; it
    must never crash or degrade."""
    results = {}
    for name, sp in (("int", False), ("sub", True)):
        acq_dir = str(tmp_path / name)
        desc = write_synthetic_acquisition(
            acq_dir, grid_cols=3, grid_rows=3, tile_w=128, tile_h=128,
            overlap=32, jitter=3, seed=13,
            acq_params_overrides={"pixel_binning": 2})
        pipe = stitch(acq_dir, use_registration=True,
                      options=EngineOptions(registration_scope='global',
                                            blend_method='feather',
                                            subpixel_placement=sp))
        out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
        results[name] = np.asarray(open_zarr_array(os.path.join(
            out, "0_stitched", "A1_stitched.ome.zarr", "0")).read().result())
        if sp:
            assert pipe.global_positions_float["A1"]
    a = results["int"].astype(float)
    b = results["sub"].astype(float)
    assert a.shape == b.shape
    # residuals are sub-pixel; bilinear resampling perturbs values only
    # slightly relative to full scale
    assert np.mean(np.abs(a - b)) < 0.02 * 65535
