"""End-to-end stitching over a multi-device mesh (virtual 8-CPU mesh)."""

import glob
import os

import numpy as np

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array


def _run(tmp_path, name, **opts):
    acq_dir = str(tmp_path / name)
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=64, tile_h=64, overlap=16,
                                channels=["Fluorescence 488 nm Ex",
                                          "Fluorescence 561 nm Ex"])
    stitch(acq_dir, options=EngineOptions(**opts))
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    return np.asarray(open_zarr_array(os.path.join(
        out, "0_stitched", "A1_stitched.ome.zarr", "0")).read().result())


def test_mesh_e2e_matches_host(tmp_path):
    sharded = _run(tmp_path, "mesh", mesh_shape=(1, 8), fusion_batch=4)
    host = _run(tmp_path, "host", fusion_device='host', fusion_batch=4)
    np.testing.assert_array_equal(sharded, host)


def test_mesh_e2e_with_flatfield(tmp_path):
    acq_dir = str(tmp_path / "ff")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    pipe = stitch(acq_dir, apply_flatfield=True,
                  options=EngineOptions(mesh_shape=(2, 4)))
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    data = np.asarray(open_zarr_array(os.path.join(
        out, "0_stitched", "A1_stitched.ome.zarr", "0")).read().result())
    assert data.max() > 0
    assert len(pipe.flatfields) == 1
