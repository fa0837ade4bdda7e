"""Drive the GUI end-to-end (offscreen).

With PyQt5 installed this constructs real widgets under
QT_QPA_PLATFORM=offscreen; without it the qt_compat headless stand-ins
carry the identical API, so the same test drives the full GUI logic —
folder pick, registration probe (combo/z population), format gating,
start (REAL spawned stitcher child process), queue polling into the
progress bar, completion, and the stop path — in any environment.
"""

import os
import time

import pytest

from fixtures import write_synthetic_acquisition

os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")

from image_stitcher_tpu import qt_compat
from image_stitcher_tpu.gui import StitchingGUI


@pytest.fixture(scope="module")
def qapp():
    app = qt_compat.QApplication.instance()
    if app is None:
        app = qt_compat.QApplication([])
    return app


def _pump(gui, qapp, timeout=180.0):
    """Poll the child's queues the way the 100 ms timer would, until the
    stitcher process exits or timeout."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        gui.poll_queues()
        if qt_compat.HAVE_QT:
            qapp.processEvents()
        if gui.stitcher is not None and not gui.stitcher.is_alive():
            gui.poll_queues()  # drain what arrived before exit
            return
        time.sleep(0.05)
    raise AssertionError("stitcher child did not finish in time")


def test_gui_full_run(tmp_path, monkeypatch, qapp):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16,
                                acq_params_overrides={"pixel_binning": 2})
    gui = StitchingGUI()

    # 1. Folder pick through the real handler (dialog monkeypatched).
    import image_stitcher_tpu.gui as gui_mod
    monkeypatch.setattr(gui_mod.QFileDialog, "getExistingDirectory",
                        staticmethod(lambda *a, **k: acq_dir))
    gui.select_input_folder()
    assert gui.input_folder == acq_dir
    assert acq_dir in gui.input_btn.text()

    # 2. Registration toggle: fields appear, probe fills channel/z.
    assert not gui.reg_channel_combo.isVisible()
    gui.reg_checkbox.setChecked(True)
    assert gui.reg_channel_combo.isVisible()
    assert gui.reg_channel_combo.count() >= 1
    assert "Fluorescence" in gui.reg_channel_combo.currentText()
    assert gui.reg_z_spin.maximum() == 0  # single z level

    # 3. Format gating: TIFF disables merges (reference gui behavior).
    gui.mt_checkbox.setChecked(True)
    gui.format_combo.setCurrentText("OME-TIFF")
    assert not gui.mt_checkbox.isEnabled() and not gui.mt_checkbox.isChecked()
    gui.format_combo.setCurrentText("OME-ZARR")
    assert gui.mt_checkbox.isEnabled()

    # 4. Start: spawns the REAL stitcher child process.
    gui.start_stitching()
    assert gui.stitcher is not None
    assert not gui.start_btn.isEnabled() and gui.stop_btn.isEnabled()
    assert gui.timer.isActive()

    # 5. Poll to completion: progress bar fills, complete enables viewer.
    _pump(gui, qapp)
    assert gui.progress.value() == gui.progress.maximum() > 0
    assert gui.output_path.endswith("A1_stitched.ome.zarr")
    assert os.path.isdir(gui.output_path)
    assert gui.view_btn.isEnabled()
    assert "Complete" in gui.status_label.text()
    assert not gui.timer.isActive()
    assert gui.start_btn.isEnabled() and not gui.stop_btn.isEnabled()


def test_gui_start_without_folder_warns(qapp):
    gui = StitchingGUI()
    if not qt_compat.HAVE_QT:
        qt_compat.QMessageBox.messages.clear()
        gui.start_stitching()
        assert gui.stitcher is None
        assert any(m[0] == 'warning' for m in qt_compat.QMessageBox.messages)
    else:
        # real QMessageBox blocks; just assert no stitcher was spawned
        # after monkeypatch-free guard (skip interaction)
        pytest.skip("modal dialog path exercised in headless mode")


def test_gui_stop_escalation(tmp_path, monkeypatch, qapp):
    """Stop -> request_stop -> join -> (terminate): child exits, UI
    returns to ready state (reference stitcher_process_gui.py:313-341)."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=64, tile_h=64, overlap=16)
    gui = StitchingGUI()
    gui.input_folder = acq_dir
    gui.start_stitching()
    assert gui.stitcher.is_alive() or True  # may finish fast; stop anyway
    gui.stop_stitching()
    assert not gui.stitcher.is_alive()
    assert gui.status_label.text() == "Stopped"
    assert gui.start_btn.isEnabled() and not gui.stop_btn.isEnabled()
    assert not gui.timer.isActive()


def test_error_and_stale_saving_restore_determinate_bar(qapp):
    """r3 review: an 'error' after a saving phase (and a stale saving
    event drained alongside newer progress ticks) must not leave the
    bar animating indeterminate forever."""
    import queue

    class FakeStitcher:
        def __init__(self):
            self.progress_queue = queue.Queue()
            self.status_queue = queue.Queue()
            self.complete_queue = queue.Queue()

    gui = StitchingGUI()
    s = FakeStitcher()
    # saving -> indeterminate
    s.status_queue.put(('status', ('Saving...', True)))
    gui._drain_queues(s)
    assert gui.progress.maximum() == 0
    # error -> determinate again
    s.status_queue.put(('error', 'disk full'))
    gui._drain_queues(s)
    assert gui.progress.maximum() > 0
    assert "Error" in gui.status_label.text()
    # stale saving drained together with newer progress ticks: the
    # ticks win (the queues carry no global order)
    s.progress_queue.put(('progress', (3, 10)))
    s.status_queue.put(('status', ('Saving...', True)))
    gui._drain_queues(s)
    assert gui.progress.maximum() == 10 and gui.progress.value() == 3
    # a saving event alone still flips to busy
    s.status_queue.put(('status', ('Saving...', True)))
    gui._drain_queues(s)
    assert gui.progress.maximum() == 0
