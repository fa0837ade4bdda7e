"""Degraded-acquisition robustness: missing tiles, irregular grids."""

import glob
import os

import numpy as np

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array


def _delete_tile(acq_dir, t, name_contains):
    for f in os.listdir(os.path.join(acq_dir, str(t))):
        if name_contains in f:
            os.remove(os.path.join(acq_dir, str(t), f))
            return f
    raise AssertionError("tile not found")


def test_missing_tile_coordinate_mode(tmp_path):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=64, tile_h=64, overlap=16)
    _delete_tile(acq_dir, 0, "A1_4_0")  # center tile gone
    pipe = stitch(acq_dir)
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    data = np.asarray(open_zarr_array(os.path.join(
        out, "0_stitched", "A1_stitched.ome.zarr", "0")).read().result())
    # canvas written; the hole no neighbor covers stays fill-value
    # (tile 4 spans 48..112 at step 48; neighbors cover up to 64 and
    # from 96 -> the only-tile-4 core is (64..96)^2)
    assert data.max() > 0
    assert data[0, 0, 0, 80, 80] == 0
    assert data[0, 0, 0, 56, 56] != 0  # neighbor overlap filled this


def test_missing_center_tile_registration_falls_back(tmp_path):
    """Center-pair scope with the center tile missing: shifts default to
    (0,0) with a warning-free fallback, like the reference's None path
    (stitcher.py:471-474)."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=128, tile_h=128, overlap=32,
                                acq_params_overrides={"pixel_binning": 2})
    _delete_tile(acq_dir, 0, "A1_4_0")  # grid-center tile
    pipe = stitch(acq_dir, use_registration=True)
    assert pipe.shifts.h_shift == (0, 0)
    assert pipe.shifts.v_shift == (0, 0)


def test_missing_tile_all_pairs_still_registers(tmp_path):
    """all-pairs keeps working when one tile is gone (its pairs drop)."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=128, tile_h=128, overlap=32,
                                acq_params_overrides={"pixel_binning": 2})
    _delete_tile(acq_dir, 0, "A1_4_0")
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_scope='all-pairs'))
    assert pipe.shifts.h_shift == (0, -32)
    assert pipe.shifts.v_shift == (-32, 0)
    # 4 of 6 horizontal and 4 of 6 vertical pairs survive
    assert len(pipe.pair_shifts['horizontal']) == 4
    assert len(pipe.pair_shifts['vertical']) == 4


def test_irregular_grid(tmp_path):
    """A short row (fewer columns) still stitches in coordinate mode."""
    import pandas as pd
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    # remove the last tile of row 1 (fov 5) from disk AND csv
    removed = _delete_tile(acq_dir, 0, "A1_5_0")
    csv = os.path.join(acq_dir, "0", "coordinates.csv")
    df = pd.read_csv(csv)
    df[df["fov"] != 5].to_csv(csv, index=False)
    pipe = stitch(acq_dir)
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    data = np.asarray(open_zarr_array(os.path.join(
        out, "0_stitched", "A1_stitched.ome.zarr", "0")).read().result())
    assert data.shape[-2:] == (112, 160)
    assert data[0, 0, 0, 80, 140] == 0  # missing corner unwritten


def test_tile_without_coordinates_row_is_skipped(tmp_path):
    """A tile file with no coordinates.csv row is excluded from the
    index (scan_acquisition join), and the stitch completes with the
    remaining tiles."""
    import pandas as pd
    from image_stitcher_tpu import scan_acquisition
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    csv = os.path.join(acq_dir, "0", "coordinates.csv")
    df = pd.read_csv(csv)
    df = df[df["fov"] != 3]  # drop the last tile's stage row
    df.to_csv(csv, index=False)
    acq = scan_acquisition(acq_dir)
    assert all(rec.fov_idx != 3 for rec in acq.tiles.values())
    stitch(acq_dir)  # completes; missing cell stays background


def test_coordinates_row_without_file_is_harmless(tmp_path):
    import pandas as pd
    from image_stitcher_tpu import scan_acquisition
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=64, tile_h=64, overlap=16)
    csv = os.path.join(acq_dir, "0", "coordinates.csv")
    df = pd.read_csv(csv)
    ghost = df.iloc[[-1]].copy()
    ghost["fov"] = 99
    ghost["x (mm)"] = 123.0
    pd.concat([df, ghost]).to_csv(csv, index=False)
    acq = scan_acquisition(acq_dir)
    assert all(rec.fov_idx != 99 for rec in acq.tiles.values())
    stitch(acq_dir)
