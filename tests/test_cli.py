import glob
import os
import sys

import numpy as np
import pytest

from fixtures import write_synthetic_acquisition


def test_cli_main_coordinate_stitch(tmp_path, capsys):
    from image_stitcher_tpu.cli import main
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    rc = main(['-i', acq_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Saved:" in out
    assert glob.glob(acq_dir + "_stitched_*/0_stitched/A1_stitched.ome.zarr")


def test_cli_params_json_override(tmp_path):
    from image_stitcher_tpu.cli import parse_args, create_params
    acq_dir = str(tmp_path / "acq")
    os.makedirs(acq_dir)
    import json
    pj = str(tmp_path / "p.json")
    json.dump({"input_folder": acq_dir, "apply_flatfield": True},
              open(pj, "w"))
    params = create_params(parse_args(['-i', 'ignored', '--params-json', pj]))
    assert params.apply_flatfield is True
    assert params.input_folder == acq_dir


def test_cli_bad_folder_exit_code():
    from image_stitcher_tpu.cli import main
    assert main(['-i', '/definitely/not/here']) == 1


def test_cli_flag_surface_matches_reference():
    """Every reference stitcher_cli.py flag must parse."""
    from image_stitcher_tpu.cli import parse_args
    args = parse_args(['-i', 'x', '-f', '.ome.tiff', '-ff', '-r',
                       '--registration-channel', '488',
                       '--registration-z-level', '1',
                       '--dynamic-registration', '-s', 'S-Pattern',
                       '-mt', '-mw'])
    assert args.output_format == '.ome.tiff'
    assert args.apply_flatfield and args.use_registration
    assert args.registration_channel == '488'
    assert args.registration_z_level == 1
    assert args.dynamic_registration
    assert args.scan_pattern == 'S-Pattern'
    assert args.merge_timepoints and args.merge_hcs_regions


def test_zarr_cli_flag_surface():
    from image_stitcher_tpu.zarr_cli import parse_args
    args = parse_args(['-i', 'x', '-r', '-rc', '488', '-rz', '2',
                       '-s', 'S-Pattern', '-w', '6'])
    assert args.num_workers == 6
    assert args.registration_z_level == 2


def test_stitcher_thread_edition(tmp_path):
    from image_stitcher_tpu.models.editions import StitcherThread
    from image_stitcher_tpu.params import StitchingParameters
    from image_stitcher_tpu.utils.progress import ProgressReporter
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=48, tile_h=48, overlap=16)
    events = []
    reporter = ProgressReporter(
        finished_saving=lambda path, dtype: events.append(('done', path)))
    t = StitcherThread(StitchingParameters(input_folder=acq_dir),
                       reporter=reporter)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive()
    assert t.error is None
    assert events and events[0][0] == 'done'
    assert t.result_path.endswith("A1_stitched.ome.zarr")


def test_queue_reporter_protocol():
    """Message tuples must match the reference protocol
    (stitcher_process.py:170-201)."""
    import queue
    from image_stitcher_tpu.utils.progress import ProgressReporter
    pq, sq, cq = queue.Queue(), queue.Queue(), queue.Queue()
    r = ProgressReporter.from_queues(pq, sq, cq)
    r.update_progress(3, 10)
    assert pq.get_nowait() == ('progress', (3, 10))
    r.status("Stitching...", False)
    assert sq.get_nowait() == ('status', ("Stitching...", False))
    r.error("boom")
    assert sq.get_nowait() == ('error', "boom")
    r.finished_saving("/out/x.ome.zarr", np.uint16)
    kind, (path, dtype) = cq.get_nowait()
    assert kind == 'complete' and path == "/out/x.ome.zarr"


def test_monitor_process_with_fake_child(capsys):
    """Drive monitor_process with a scripted fake child."""
    import queue
    from image_stitcher_tpu.process_cli import monitor_process

    class FakeChild:
        def __init__(self):
            self.alive_polls = 6
            self.exitcode = 0

        def is_alive(self):
            self.alive_polls -= 1
            return self.alive_polls > 0

        def join(self, timeout=None):
            pass

    pq, sq, cq = queue.Queue(), queue.Queue(), queue.Queue()
    pq.put(('progress', (1, 4)))
    sq.put(('status', ('Stitching...', False)))
    cq.put(('complete', ('/out/a.ome.zarr', 'uint16')))
    import threading
    rc = monitor_process(FakeChild(), pq, sq, cq, threading.Event())
    assert rc == 0
    out = capsys.readouterr().out
    assert "Progress: 1/4" in out
    assert "Complete: /out/a.ome.zarr" in out


def test_tiff_merge_gated(tmp_path):
    """Merges require zarr; tiff runs skip them with an error message."""
    from image_stitcher_tpu import StitchingParameters, EngineOptions
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu.utils.progress import ProgressReporter
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=48, tile_h=48, overlap=16)
    errors = []
    rep = ProgressReporter(error=lambda m: errors.append(m))
    p = StitchingParameters(input_folder=acq_dir, output_format='.ome.tiff',
                            merge_timepoints=True)
    pipe = StitchPipeline(p, EngineOptions(), rep)
    path = pipe.run()
    assert path.endswith(".ome.tiff")
    assert errors and "zarr" in errors[0]


def test_gui_wavelength_extraction():
    from image_stitcher_tpu.gui import StitchingGUI
    f = StitchingGUI._extract_wavelength
    assert f("Fluorescence 488 nm Ex") == "488"
    assert f("BF_R") == "R"
    assert f("plain") is None


def test_stitcher_process_spawned_child(tmp_path):
    """Real child-process edition end to end (spawn + queue protocol)."""
    from image_stitcher_tpu.models.editions import StitcherProcess
    from image_stitcher_tpu.params import EngineOptions, StitchingParameters
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=48, tile_h=48, overlap=16)
    # flatfield on: the spawned child runs the overlapped per-channel
    # fit gate end to end under the queue protocol
    params = StitchingParameters(input_folder=acq_dir, apply_flatfield=True)
    sp = StitcherProcess(params, options=EngineOptions(fusion_device='host'))
    sp.start()
    sp.join(timeout=180)
    if sp.is_alive():
        sp.terminate()
        sp.join(timeout=10)
        pytest.skip("child did not finish in time (environment)")
    assert sp.exitcode == 0
    messages = []
    while not sp.complete_queue.empty():
        messages.append(sp.complete_queue.get_nowait())
    assert messages and messages[-1][0] == 'complete'
    path, dtype = messages[-1][1]
    assert path.endswith("A1_stitched.ome.zarr")
    assert os.path.isdir(path)


def test_cli_registration_report_flag(tmp_path):
    import json

    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu.cli import main
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=64, tile_h=64, overlap=16,
                                acq_params_overrides={"pixel_binning": 2})
    assert main(['-i', acq_dir, '-r', '--registration-scope', 'all-pairs',
                 '--registration-report']) == 0
    import glob
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    with open(os.path.join(out, "registration_report.json")) as f:
        rep = json.load(f)
    assert rep["regions"]["A1"]["scope"] == "all-pairs"
    assert len(rep["regions"]["A1"]["pairs"]) == 1
