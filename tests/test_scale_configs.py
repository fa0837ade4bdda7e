"""Reduced versions of the remaining BASELINE eval configs."""

import glob
import os
import string

import numpy as np

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array, read_attrs


def test_96_well_hcs_plate(tmp_path):
    """BASELINE config 5: 96-well plate (A1..H12), merged per timepoint."""
    regions = [f"{r}{c}" for r in string.ascii_uppercase[:8]
               for c in range(1, 13)]
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=1, grid_rows=1,
                                tile_w=32, tile_h=32, overlap=8,
                                regions=regions)
    pipe = stitch(acq_dir, merge_hcs_regions=True)
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    plate = os.path.join(out, "hcs_timepoints", "0_hcs.ome.zarr")
    attrs = read_attrs(plate)
    p = attrs["plate"]
    assert len(p["wells"]) == 96
    assert [r["name"] for r in p["rows"]] == list("ABCDEFGH")
    assert len(p["columns"]) == 12
    # spot-check corners of the plate tree
    for well in ("A/1", "H/12"):
        row, col = well.split("/")
        data = np.asarray(open_zarr_array(
            os.path.join(plate, row, col, "0", "0")).read().result())
        assert data.shape == (1, 1, 1, 32, 32)
        assert data.max() > 0


def test_deep_zstack_tczyx(tmp_path):
    """BASELINE config 4 (reduced z): Z=10 TCZYX with per-z placement."""
    acq_dir = str(tmp_path / "acq")
    desc = write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                       tile_w=96, tile_h=96, overlap=32,
                                       num_z=10)
    stitch(acq_dir)
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr")
    data = np.asarray(open_zarr_array(os.path.join(zp, "0")).read().result())
    assert data.shape == (1, 1, 10, 160, 160)
    # every z level carries the same (synthetic) content, placed exactly
    y0, x0 = desc.tile_origins[("A1", 0, 0, 0)]
    gt = desc.ground_truth[y0:y0 + 160, x0:x0 + 160]
    for z in range(10):
        np.testing.assert_array_equal(data[0, 0, z], gt)
    # z scale in metadata from acquisition dz
    attrs = read_attrs(zp)
    scale = attrs["multiscales"][0]["datasets"][0]["coordinateTransformations"][0]["scale"]
    assert scale[2] == 1.5  # dz(um) from DEFAULT_ACQ_PARAMS


def test_multi_region_multi_timepoint_pipelined(tmp_path):
    """Pipelined save across 2 regions x 2 timepoints stays correct."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=48, tile_h=48, overlap=16,
                                regions=["B2", "C3"], timepoints=2)
    pipe = stitch(acq_dir, options=EngineOptions(pipelined_save=True))
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    paths = [os.path.join(out, f"{t}_stitched", f"{r}_stitched.ome.zarr")
             for t in (0, 1) for r in ("B2", "C3")]
    for p in paths:
        assert os.path.isdir(p), p
    assert len(pipe.saved_paths) == 4
    # non-pipelined run produces identical bytes
    acq_dir2 = str(tmp_path / "acq2")
    write_synthetic_acquisition(acq_dir2, grid_cols=2, grid_rows=1,
                                tile_w=48, tile_h=48, overlap=16,
                                regions=["B2", "C3"], timepoints=2)
    stitch(acq_dir2, options=EngineOptions(pipelined_save=False))
    out2 = sorted(glob.glob(acq_dir2 + "_stitched_*"))[-1]
    a = np.asarray(open_zarr_array(os.path.join(
        out, "1_stitched", "C3_stitched.ome.zarr", "0")).read().result())
    b = np.asarray(open_zarr_array(os.path.join(
        out2, "1_stitched", "C3_stitched.ome.zarr", "0")).read().result())
    np.testing.assert_array_equal(a, b)


def test_merges_skip_missing_units(tmp_path):
    """continue_on_error leaves failed (t, region) stores absent; the
    merge passes must skip them with a message instead of crashing."""
    import shutil

    from image_stitcher_tpu import StitchingParameters
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu.utils.progress import ProgressReporter
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=1, grid_rows=1,
                                tile_w=32, tile_h=32, overlap=8,
                                regions=["A1", "A2", "B1"])
    msgs = []
    p = StitchingParameters(input_folder=acq_dir, merge_hcs_regions=True,
                            merge_timepoints=True)
    pipe = StitchPipeline(p, EngineOptions(), reporter=ProgressReporter(
        status=lambda m, s=False: msgs.append(m)))
    # simulate a failed region: stitch everything, delete one store,
    # then run the merges directly
    pipe.run()
    victim = os.path.join(pipe.output_folder, "0_stitched",
                          "A2_stitched.ome.zarr")
    shutil.rmtree(victim)
    from image_stitcher_tpu.models.merge import run_merges
    out = run_merges(pipe)
    assert any("skipping region A2" in m for m in msgs)
    from image_stitcher_tpu.io.zarr_store import read_attrs
    wells = [w["path"] for w in read_attrs(out)["plate"]["wells"]]
    assert wells == ["A/1", "B/1"]
    for well in wells:
        data = np.asarray(open_zarr_array(
            os.path.join(out, well, "0", "0")).read().result())
        assert data.max() > 0
