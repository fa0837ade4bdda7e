import glob
import os
import threading

import numpy as np
import pytest

from image_stitcher_tpu import EngineOptions, StitchingParameters, stitch
from image_stitcher_tpu.models.pipeline import StitchPipeline
from image_stitcher_tpu.utils.manifest import RunManifest, find_resumable
from image_stitcher_tpu.utils.progress import ProgressReporter, StitchCancelled

from fixtures import write_synthetic_acquisition


def make_acq(tmp_path, regions=("A1", "A2"), timepoints=2):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16,
                                regions=list(regions), timepoints=timepoints)
    return acq_dir


def test_manifest_round_trip(tmp_path):
    from image_stitcher_tpu.core.geometry import RegistrationShifts
    m = RunManifest(str(tmp_path / "out"))
    m.set_params({"a": 1})
    m.set_shifts(RegistrationShifts(h_shift=(1, -30), v_shift=(-31, 2),
                                    scan_pattern='S-Pattern'))
    m.save_flatfields({0: np.ones((4, 4), np.float32) * 1.5})
    m.mark_completed(0, "A1")
    m2 = RunManifest.load(str(tmp_path / "out"))
    assert m2.is_completed(0, "A1")
    assert not m2.is_completed(0, "A2")
    s = m2.get_shifts()
    assert s.h_shift == (1, -30) and s.scan_pattern == 'S-Pattern'
    ff = m2.load_flatfields()
    np.testing.assert_array_equal(ff[0], np.ones((4, 4)) * 1.5)


def test_resume_skips_completed(tmp_path):
    acq_dir = make_acq(tmp_path)
    # interrupt after the first region completes
    stop = threading.Event()
    count = [0]

    def on_status(msg, is_saving=False):
        if msg.startswith("Completed region"):
            count[0] += 1
            if count[0] == 2:
                stop.set()

    rep = ProgressReporter(status=on_status)
    params = StitchingParameters(input_folder=acq_dir, use_registration=True)
    pipe = StitchPipeline(params, EngineOptions(), rep, stop_event=stop)
    with pytest.raises(StitchCancelled):
        pipe.run()
    out = pipe.output_folder
    m = RunManifest.load(out)
    assert len(m.data["completed"]) == 2

    # resume: same params -> finds the folder, skips completed units
    assert find_resumable(acq_dir, params.to_dict()) == out
    skipped = []
    rep2 = ProgressReporter(
        status=lambda msg, s=False: skipped.append(msg)
        if msg.startswith("Skipping") else None)
    params2 = StitchingParameters(input_folder=acq_dir, use_registration=True)
    pipe2 = StitchPipeline(params2, EngineOptions(), rep2, resume=True)
    pipe2.run()
    assert pipe2.output_folder == out
    assert len(skipped) == 2
    m = RunManifest.load(out)
    assert len(m.data["completed"]) == 4
    # shifts reused from the manifest
    assert pipe2.shifts.h_shift == pipe.shifts.h_shift
    # all four region outputs exist
    for t in (0, 1):
        for r in ("A1", "A2"):
            assert os.path.isdir(os.path.join(
                out, f"{t}_stitched", f"{r}_stitched.ome.zarr"))


def test_resume_incompatible_params_starts_fresh(tmp_path):
    acq_dir = make_acq(tmp_path, regions=("A1",), timepoints=1)
    stitch(acq_dir)
    # different params -> no resumable folder
    p = StitchingParameters(input_folder=acq_dir, apply_flatfield=True)
    assert find_resumable(acq_dir, p.to_dict()) is None
    pipe = StitchPipeline(p, resume=True)
    assert not pipe.resumed


def test_resume_reuses_flatfields(tmp_path):
    acq_dir = make_acq(tmp_path, regions=("A1", "A2"), timepoints=1)
    # interrupt after the first region so the run stays unfinished
    stop = threading.Event()
    rep = ProgressReporter(
        status=lambda m, s=False: stop.set()
        if m.startswith("Completed region") else None)
    p = StitchingParameters(input_folder=acq_dir, apply_flatfield=True)
    pipe = StitchPipeline(p, EngineOptions(pipelined_save=False),
                          rep, stop_event=stop)
    with pytest.raises(StitchCancelled):
        pipe.run()
    out = pipe.output_folder
    assert os.path.exists(os.path.join(out, "flatfields.npz"))

    p2 = StitchingParameters(input_folder=acq_dir, apply_flatfield=True)
    pipe2 = StitchPipeline(p2, resume=True)
    pipe2.run()
    assert pipe2.output_folder == out
    np.testing.assert_array_equal(pipe2.flatfields[0], pipe.flatfields[0])


def test_finished_runs_are_not_resumed(tmp_path):
    """--resume on a completed run starts a fresh output folder."""
    acq_dir = make_acq(tmp_path, regions=("A1",), timepoints=1)
    p = StitchingParameters(input_folder=acq_dir)
    pipe = StitchPipeline(p)
    pipe.run()
    p2 = StitchingParameters(input_folder=acq_dir)
    pipe2 = StitchPipeline(p2, resume=True)
    assert not pipe2.resumed
    assert pipe2.output_folder != pipe.output_folder


def test_continue_on_error(tmp_path, monkeypatch):
    acq_dir = make_acq(tmp_path, regions=("A1", "A2"), timepoints=1)
    errors = []
    rep = ProgressReporter(error=lambda m: errors.append(m))
    p = StitchingParameters(input_folder=acq_dir)
    pipe = StitchPipeline(p, EngineOptions(continue_on_error=True), rep)

    real = pipe.stitch_region

    def flaky(t, region):
        if region == "A1":
            raise RuntimeError("boom")
        return real(t, region)

    monkeypatch.setattr(pipe, "stitch_region", flaky)
    pipe.run()
    assert len(errors) == 1 and "boom" in errors[0]
    out = pipe.output_folder
    assert os.path.isdir(os.path.join(out, "0_stitched", "A2_stitched.ome.zarr"))
    assert not os.path.isdir(os.path.join(out, "0_stitched", "A1_stitched.ome.zarr"))


def test_subpixel_global_resume(tmp_path):
    """Resume restores float positions (regression: AttributeError)."""
    acq_dir = make_acq(tmp_path, regions=("A1", "A2"), timepoints=1)
    stop = threading.Event()
    rep = ProgressReporter(
        status=lambda m, s=False: stop.set()
        if m.startswith("Completed region") else None)
    opts = EngineOptions(registration_scope='global',
                         subpixel_placement=True, pipelined_save=False)
    p = StitchingParameters(input_folder=acq_dir, use_registration=True)
    pipe = StitchPipeline(p, opts, rep, stop_event=stop)
    with pytest.raises(StitchCancelled):
        pipe.run()
    floats = {r: dict(v) for r, v in pipe.global_positions_float.items()}

    p2 = StitchingParameters(input_folder=acq_dir, use_registration=True)
    pipe2 = StitchPipeline(p2, EngineOptions(registration_scope='global',
                                             subpixel_placement=True),
                           resume=True)
    pipe2.run()  # must not raise
    assert pipe2.resumed
    for region, per in floats.items():
        assert pipe2.global_positions_float.get(region) == per

    # toggling subpixel changes the output fingerprint -> fresh run
    p3 = StitchingParameters(input_folder=acq_dir, use_registration=True)
    pipe3 = StitchPipeline(p3, EngineOptions(registration_scope='global',
                                             subpixel_placement=False),
                           resume=True)
    assert not pipe3.resumed


def test_resume_skips_completed_tiff(tmp_path):
    """--resume works for OME-TIFF output too: completed (t, region)
    units are skipped and their .ome.tiff files survive untouched."""
    acq_dir = make_acq(tmp_path)
    stop = threading.Event()
    count = [0]

    def on_status(msg, is_saving=False):
        if msg.startswith("Completed region"):
            count[0] += 1
            if count[0] == 2:
                stop.set()

    params = StitchingParameters(input_folder=acq_dir, use_registration=True,
                                 output_format='.ome.tiff')
    pipe = StitchPipeline(params, EngineOptions(),
                          ProgressReporter(status=on_status),
                          stop_event=stop)
    with pytest.raises(StitchCancelled):
        pipe.run()
    out = pipe.output_folder
    # the manifest is the source of truth: a unit's file can exist on
    # disk mid-save without being recorded complete — resume must
    # re-run exactly the unrecorded ones (the stop trips after the 2nd
    # completion, but pipelined saves can land a 3rd file first)
    completed = RunManifest.load(out).data["completed"]
    assert 2 <= len(completed) < 4
    done_files = [os.path.join(out, f"{k.split('/')[0]}_stitched",
                               f"{k.split('/')[1]}_stitched.ome.tiff")
                  for k in completed]
    for f in done_files:
        assert os.path.exists(f)
    mtimes = {f: os.path.getmtime(f) for f in done_files}

    skipped = []
    pipe2 = StitchPipeline(
        StitchingParameters(input_folder=acq_dir, use_registration=True,
                            output_format='.ome.tiff'),
        EngineOptions(),
        ProgressReporter(status=lambda m, s=False: skipped.append(m)
                         if m.startswith("Skipping") else None),
        resume=True)
    pipe2.run()
    assert pipe2.output_folder == out
    assert len(skipped) == len(done_files)
    all_files = sorted(glob.glob(os.path.join(out, "*_stitched",
                                              "*.ome.tiff")))
    assert len(all_files) == 4
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t  # completed units untouched


def test_process_edition_resume(tmp_path):
    """StitcherProcess(resume=True) — the production child-process
    edition — continues an interrupted run: completed units skipped,
    the tree finished, manifest complete. (--resume now reaches all
    three CLIs through this path.)"""
    acq_dir = make_acq(tmp_path)
    stop = threading.Event()
    count = [0]

    def on_status(msg, is_saving=False):
        if msg.startswith("Completed region"):
            count[0] += 1
            if count[0] == 2:
                stop.set()

    params = StitchingParameters(input_folder=acq_dir, use_registration=True)
    pipe = StitchPipeline(params, EngineOptions(),
                          ProgressReporter(status=on_status),
                          stop_event=stop)
    with pytest.raises(StitchCancelled):
        pipe.run()
    out = pipe.output_folder
    n_done = len(RunManifest.load(out).data["completed"])
    assert 2 <= n_done < 4

    from image_stitcher_tpu.models.editions import StitcherProcess
    proc = StitcherProcess(
        StitchingParameters(input_folder=acq_dir, use_registration=True),
        resume=True)
    proc.start()
    proc.join(timeout=120)
    assert not proc.is_alive()
    assert proc.exitcode == 0
    # completion message names the SAME output folder (resumed in place)
    kind, (path, _dtype) = proc.complete_queue.get(timeout=5)
    assert kind == 'complete'
    assert os.path.dirname(os.path.dirname(path)) == out
    m = RunManifest.load(out)
    assert len(m.data["completed"]) == 4
    for t in (0, 1):
        for r in ("A1", "A2"):
            assert os.path.isdir(os.path.join(
                out, f"{t}_stitched", f"{r}_stitched.ome.zarr"))


def test_explicit_folder_resume_refuses_incompatible_settings(tmp_path):
    """resume=True into an explicit output_folder must enforce the same
    params/output-fingerprint compatibility find_resumable does —
    otherwise a re-run with different blend/chunks silently mixes
    settings in one tree and then overwrites the manifest fingerprint,
    hiding the mismatch for good."""
    acq_dir = make_acq(tmp_path, regions=("A1", "A2"), timepoints=1)
    out = str(tmp_path / "pinned")
    stop = threading.Event()
    rep = ProgressReporter(
        status=lambda m, s=False: stop.set()
        if m.startswith("Completed region") else None)
    p = StitchingParameters(input_folder=acq_dir)
    pipe = StitchPipeline(p, EngineOptions(output_folder=out,
                                           pipelined_save=False),
                          rep, stop_event=stop)
    with pytest.raises(StitchCancelled):
        pipe.run()

    # incompatible output-affecting option -> refuse
    with pytest.raises(ValueError, match="refusing to resume"):
        StitchPipeline(StitchingParameters(input_folder=acq_dir),
                       EngineOptions(output_folder=out,
                                     blend_method='feather'),
                       resume=True)

    # same settings -> resumes in place and completes
    pipe2 = StitchPipeline(StitchingParameters(input_folder=acq_dir),
                           EngineOptions(output_folder=out,
                                         pipelined_save=False),
                           resume=True)
    pipe2.run()
    assert pipe2.resumed
    for r in ("A1", "A2"):
        assert os.path.isdir(os.path.join(
            out, "0_stitched", f"{r}_stitched.ome.zarr"))
