"""Golden OME-Zarr metadata: exact trees, locked against drift."""

import glob
import json
import os

import numpy as np

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import stitch
from image_stitcher_tpu.io.omezarr import (OME_AXES, multiscales_attrs,
                                           omero_attrs, plate_attrs,
                                           well_attrs)


def test_multiscales_golden():
    got = multiscales_attrs("A1_t0", 3, 1.5, 0.5)
    expect = {
        "multiscales": [{
            "axes": [
                {"name": "t", "type": "time", "unit": "second"},
                {"name": "c", "type": "channel"},
                {"name": "z", "type": "space", "unit": "micrometer"},
                {"name": "y", "type": "space", "unit": "micrometer"},
                {"name": "x", "type": "space", "unit": "micrometer"},
            ],
            "datasets": [
                {"path": "0", "coordinateTransformations": [
                    {"type": "scale", "scale": [1, 1, 1.5, 0.5, 0.5]}]},
                {"path": "1", "coordinateTransformations": [
                    {"type": "scale", "scale": [1, 1, 1.5, 1.0, 1.0]}]},
                {"path": "2", "coordinateTransformations": [
                    {"type": "scale", "scale": [1, 1, 1.5, 2.0, 2.0]}]},
            ],
            "name": "A1_t0",
            "version": "0.4",
        }]
    }
    assert got == expect


def test_omero_golden_full():
    got = omero_attrs("A1_t0", ["DAPI", "GFP"], [0x0000FF, 0x00FF00],
                      np.uint16, full=True)
    expect = {
        "name": "A1_t0", "version": "0.4", "id": 1,
        "channels": [
            {"label": "DAPI", "color": "0000FF",
             "window": {"start": 0, "end": 65535, "min": 0, "max": 65535},
             "active": True, "coefficient": 1, "family": "linear"},
            {"label": "GFP", "color": "00FF00",
             "window": {"start": 0, "end": 65535, "min": 0, "max": 65535},
             "active": True, "coefficient": 1, "family": "linear"},
        ],
    }
    assert got == expect


def test_omero_golden_reduced():
    got = omero_attrs("Region_A1", ["x"], [0x770000], np.uint8, full=False)
    assert got == {
        "name": "Region_A1", "version": "0.4",
        "channels": [{"label": "x", "color": "770000",
                      "window": {"start": 0, "end": 255}}],
    }


def test_plate_golden():
    got = plate_attrs(["A1", "B12"], "Complete HCS Dataset",
                      "Stitched Acquisition")
    assert got == {
        "plate": {
            "acquisitions": [{"id": 0, "maximumfieldcount": 1,
                              "name": "Stitched Acquisition"}],
            "columns": [{"name": "1"}, {"name": "12"}],
            "field_count": 1,
            "name": "Complete HCS Dataset",
            "rows": [{"name": "A"}, {"name": "B"}],
            "version": "0.4",
            "wells": [
                {"path": "A/1", "rowIndex": 0, "columnIndex": 0},
                {"path": "B/12", "rowIndex": 1, "columnIndex": 1},
            ],
        }
    }


def test_well_golden():
    assert well_attrs() == {
        "well": {"images": [{"path": "0", "acquisition": 0}],
                 "version": "0.4"}}


def test_on_disk_zattrs_golden(tmp_path):
    """The actual files written by a run match the golden trees exactly."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=64, tile_h=64, overlap=16,
                                channels=["Fluorescence 405 nm Ex"])
    stitch(acq_dir)
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr")
    with open(os.path.join(zp, ".zattrs")) as f:
        attrs = json.load(f)
    assert attrs == {
        **multiscales_attrs("A1_t0", 1, 1.5, 1.0),
        "omero": omero_attrs("A1_t0", ["Fluorescence 405 nm Ex"],
                             [0x0000FF], np.uint16, full=True),
    }
    with open(os.path.join(zp, ".zgroup")) as f:
        assert json.load(f) == {"zarr_format": 2}
    with open(os.path.join(zp, "0", ".zarray")) as f:
        zarray = json.load(f)
    assert zarray["shape"] == [1, 1, 1, 64, 112]
    assert zarray["chunks"] == [1, 1, 1, 64, 112]  # clipped to extent
    assert zarray["dtype"] == "<u2"
    assert zarray["dimension_separator"] == "/"
    assert zarray["compressor"]["id"] == "blosc"
