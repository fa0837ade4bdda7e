"""RGB (brightfield) acquisitions through the full pipeline."""

import glob
import json
import os

import cv2
import numpy as np
import pandas as pd
import pytest

from fixtures import DEFAULT_ACQ_PARAMS
from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array, read_attrs


def write_rgb_acquisition(folder, grid=2, tile=64, overlap=16):
    os.makedirs(os.path.join(folder, "0"), exist_ok=True)
    with open(os.path.join(folder, "acquisition parameters.json"), "w") as f:
        json.dump(DEFAULT_ACQ_PARAMS, f)
    rng = np.random.default_rng(5)
    step = tile - overlap
    size = step * (grid - 1) + tile
    gt = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    rows = []
    for r in range(grid):
        for c in range(grid):
            fov = r * grid + c
            y0, x0 = r * step, c * step
            t = gt[y0:y0 + tile, x0:x0 + tile]
            cv2.imwrite(os.path.join(
                folder, "0", f"A1_{fov}_0_BF_LED_matrix_full.png"),
                t[:, :, ::-1])  # cv2 writes BGR
            rows.append({"region": "A1", "fov": fov, "z_level": 0,
                         "x (mm)": x0 / 1000.0, "y (mm)": y0 / 1000.0,
                         "z (um)": 0.0})
    pd.DataFrame(rows).to_csv(os.path.join(folder, "0", "coordinates.csv"),
                              index=False)
    return gt


@pytest.mark.parametrize("backend", ["host", "streaming", "device"])
def test_rgb_stitch_all_backends(tmp_path, backend):
    folder = str(tmp_path / backend)
    gt = write_rgb_acquisition(folder)
    opts = {"host": dict(fusion_device='host', streaming='off'),
            "streaming": dict(fusion_device='host', streaming='on',
                              chunks=(1, 1, 1, 32, 32)),
            "device": dict(fusion_device='device')}[backend]
    pipe = stitch(folder, options=EngineOptions(**opts))
    assert pipe.acq.monochrome_channels == [
        "BF LED matrix full_R", "BF LED matrix full_G",
        "BF LED matrix full_B"]
    out = sorted(glob.glob(folder + "_stitched_*"))[-1]
    zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr")
    data = np.asarray(open_zarr_array(os.path.join(zp, "0")).read().result())
    assert data.shape == (1, 3, 1, 112, 112)
    for plane in range(3):
        np.testing.assert_array_equal(data[0, plane, 0], gt[..., plane])
    attrs = read_attrs(zp)
    colors = [c["color"] for c in attrs["omero"]["channels"]]
    assert colors == ["FF0000", "00FF00", "0000FF"]


def test_rgb_flatfield(tmp_path):
    folder = str(tmp_path / "ff")
    write_rgb_acquisition(folder, grid=3, tile=64, overlap=16)
    pipe = stitch(folder, apply_flatfield=True)
    # three per-plane flatfields fitted
    assert sorted(pipe.flatfields) == [0, 1, 2]
