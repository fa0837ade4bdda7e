"""Regression tests for the round-1 code-review findings."""

import glob
import os

import numpy as np
import pytest

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, StitchingParameters, stitch
from image_stitcher_tpu.models.pipeline import StitchPipeline
from image_stitcher_tpu.utils.progress import ProgressReporter


def test_global_positions_are_per_region(tmp_path):
    """Each region gets its own solve (finding: region-0 positions were
    applied to every region)."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=128, tile_h=128, overlap=32,
                                regions=["A1", "B2"], jitter=3,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_scope='global'))
    assert set(pipe.global_positions) == {"A1", "B2"}
    # jitter differs per region -> solutions differ
    a = pipe.global_positions["A1"]
    b = pipe.global_positions["B2"]
    assert a.keys() == b.keys()
    assert any(a[k] != b[k] for k in a)


def test_global_resume_restores_positions(tmp_path):
    """Finding: resume dropped global positions and fell back to grid."""
    import threading
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=128, tile_h=128, overlap=32,
                                regions=["A1", "A2"], jitter=2,
                                acq_params_overrides={"pixel_binning": 2})
    stop = threading.Event()
    rep = ProgressReporter(
        status=lambda m, s=False: stop.set()
        if m.startswith("Completed region") else None)
    p = StitchingParameters(input_folder=acq_dir, use_registration=True)
    opts = EngineOptions(registration_scope='global', pipelined_save=False)
    pipe = StitchPipeline(p, opts, rep, stop_event=stop)
    from image_stitcher_tpu.utils.progress import StitchCancelled
    with pytest.raises(StitchCancelled):
        pipe.run()
    solved = dict(pipe.global_positions)

    p2 = StitchingParameters(input_folder=acq_dir, use_registration=True)
    pipe2 = StitchPipeline(p2, EngineOptions(registration_scope='global'),
                           resume=True)
    pipe2.run()
    assert pipe2.resumed
    for region, per in solved.items():
        assert pipe2.global_positions.get(region) == per


def test_streaming_progress_counts_jobs_once(tmp_path):
    """Finding: band-spanning tiles over-counted progress."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=4,
                                tile_w=96, tile_h=96, overlap=16)
    seen = []
    rep = ProgressReporter(update_progress=lambda n, t: seen.append((n, t)))
    p = StitchingParameters(input_folder=acq_dir)
    # 64-row chunks force bands smaller than tiles -> every tile spans
    StitchPipeline(p, EngineOptions(streaming='on',
                                    chunks=(1, 1, 1, 64, 64)), rep).run()
    assert seen
    max_n = max(n for n, t in seen)
    totals = {t for n, t in seen}
    assert totals == {8}
    assert max_n == 8  # exactly the number of tile jobs


def test_streaming_respects_explicit_device(tmp_path):
    """Finding (r1): streaming hijacked fusion_device='device' onto the
    host path. Since r2 the device choice is honored WITHIN streaming:
    an explicit device + streaming='on' runs the HBM-banded device
    fuser (stream_fuse_save), not the host bands and not in-RAM."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    pipe = stitch(acq_dir, options=EngineOptions(
        streaming='on', fusion_device='device'))
    assert 'stream_fuse_save' in pipe.timers.totals
    assert 'fuse' not in pipe.timers.totals


def test_flatfield_samples_span_timepoints(tmp_path, monkeypatch):
    """Finding: samples were truncated to the first timepoint's 32."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=6, grid_rows=6,
                                tile_w=32, tile_h=32, overlap=8,
                                timepoints=2)
    p = StitchingParameters(input_folder=acq_dir, apply_flatfield=True)
    pipe = StitchPipeline(p, EngineOptions())
    from image_stitcher_tpu.io import acquisition as acq_mod
    pipe.acq = acq_mod.scan_acquisition(acq_dir)

    sampled = []
    from image_stitcher_tpu.ops import flatfield as ff_mod
    real_fit = ff_mod.fit_flatfield_stack_np

    def spy_fit(images, *a, **k):
        sampled.append(images.shape[0])
        return real_fit(images, *a, **k)

    monkeypatch.setattr(ff_mod, "fit_flatfield_stack_np", spy_fit)
    # spy on which files get sampled
    read_paths = []
    real_load = ff_mod.load_sample_small

    def spy_load(path, *a, **k):
        read_paths.append(path)
        return real_load(path, *a, **k)

    monkeypatch.setattr(ff_mod, "load_sample_small", spy_load)
    pipe.compute_flatfields()
    # host path fits every unique sample once (no cycle padding):
    # 32 from each of the two timepoints
    assert sampled == [64]
    # samples drawn from both timepoints (32 from t0 + 32 from t1)
    t0 = sum(1 for p_ in set(read_paths) if f"{os.sep}0{os.sep}" in p_)
    t1 = sum(1 for p_ in set(read_paths) if f"{os.sep}1{os.sep}" in p_)
    assert t0 == 32 and t1 == 32


def test_zero_margin_registration(tmp_path):
    """Finding: margin=0 produced empty strips via a[0:-0]."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=256, tile_h=256, overlap=64,
                                acq_params_overrides={"pixel_binning": 2})
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(registration_margin=0.0))
    assert pipe.shifts.h_shift == (0, -64)
    assert pipe.shifts.v_shift == (-64, 0)
