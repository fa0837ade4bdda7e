import glob
import os

import numpy as np
import pytest

from image_stitcher_tpu import EngineOptions, stitch

from fixtures import write_synthetic_acquisition


def test_all_pairs_matches_center_on_clean_grid(tmp_path):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=256, tile_h=256, overlap=64,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_scope='all-pairs'))
    assert pipe.shifts.h_shift == (0, -64)
    assert pipe.shifts.v_shift == (-64, 0)
    # all 6 horizontal + 6 vertical pairs measured
    assert len(pipe.pair_shifts['horizontal']) == 6
    assert len(pipe.pair_shifts['vertical']) == 6


def test_all_pairs_robust_to_one_bad_tile(tmp_path):
    """Blank out one tile; the median keeps the correct grid shift where
    the center-pair estimate could be poisoned."""
    import cv2
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=256, tile_h=256, overlap=64,
                                acq_params_overrides={"pixel_binning": 2})
    # corrupt the exact center tile (fov 4) used by the center-pair scope
    victim = os.path.join(acq_dir, "0",
                          "A1_4_0_Fluorescence_488_nm_Ex.tiff")
    assert os.path.exists(victim)
    noise = (np.random.default_rng(0).integers(0, 65535, (256, 256))
             .astype(np.uint16))
    cv2.imwrite(victim, noise)
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_scope='all-pairs'))
    assert pipe.shifts.h_shift == (0, -64)
    assert pipe.shifts.v_shift == (-64, 0)


def test_all_pairs_s_pattern_split(tmp_path):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=4,
                                tile_w=128, tile_h=128, overlap=32,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True, scan_pattern='S-Pattern',
                  options=EngineOptions(registration_scope='all-pairs'))
    # clean fixture: forward and reverse rows agree
    assert pipe.shifts.h_shift == (0, -32)
    assert pipe.shifts.h_shift_rev == (0, -32)
    assert pipe.shifts.v_shift == (-32, 0)


def test_all_pairs_device_batch_path(tmp_path):
    """threshold=0 forces the jitted batched kernel; same shifts."""
    acq_dir = str(tmp_path / "acqdev")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=256, tile_h=256, overlap=64,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_scope='all-pairs',
                                        registration_device_threshold=0))
    assert pipe.shifts.h_shift == (0, -64)
    assert pipe.shifts.v_shift == (-64, 0)
