import glob
import os

import numpy as np

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import (list_outputs, open_stitched, stitch)


def test_open_stitched_and_list_outputs(tmp_path):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16,
                                channels=["Fluorescence 405 nm Ex",
                                          "Fluorescence 488 nm Ex"],
                                timepoints=2)
    stitch(acq_dir, merge_timepoints=True)
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]

    listing = list_outputs(out)
    assert len(listing["regions"]) == 2
    assert len(listing["time_series"]) == 1
    assert listing["hcs"] == []

    img = open_stitched(listing["regions"][0])
    assert img.num_levels >= 1
    assert img.channel_names == ["Fluorescence 405 nm Ex",
                                 "Fluorescence 488 nm Ex"]
    assert img.pixel_size_um == 1.0
    data = img.read(0)
    assert data.shape[1] == 2 and data.dtype == np.uint16

    ts = open_stitched(listing["time_series"][0])
    assert ts.read(0).shape[0] == 2  # merged timepoints


def test_profiling_utils():
    import time
    from image_stitcher_tpu.utils.profiling import StageTimers, device_trace
    t = StageTimers()
    with t.time("a"):
        time.sleep(0.01)
    t.record("b", 2.5)
    assert t.totals["b"] == 2.5
    lines = t.summary()
    assert any("a" in ln for ln in lines)
    with device_trace(None):  # no-op path
        pass
    assert t.as_dict()["b"] == 2.5


def test_save_bench_tool(tmp_path):
    from image_stitcher_tpu.tools.save_bench import measure
    results = measure(256, 1, 1, [128], ["ome_zarr_tensorstore",
                                         "zlib_chunks"])
    assert len(results) == 2
    assert all(r["seconds"] >= 0 and r["mb"] > 0 for r in results)


def test_open_stitched_v3(tmp_path):
    """open_stitched unwraps NGFF 0.5 'ome' attrs (zarr v3 outputs)."""
    import glob

    from image_stitcher_tpu import EngineOptions, open_stitched, stitch
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=48, tile_h=48, overlap=16)
    stitch(acq_dir, options=EngineOptions(zarr_format=3,
                                          chunks=(1, 1, 1, 32, 32)))
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    img = open_stitched(os.path.join(out, "0_stitched",
                                     "A1_stitched.ome.zarr"))
    assert img.num_levels >= 1
    assert img.channel_names == ["Fluorescence 488 nm Ex"]
    assert img.read(0).shape[-2:] == (48, 80)
