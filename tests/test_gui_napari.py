"""Drive the GUI's napari view path with a stubbed napari module.

napari is absent in this environment, so these tests inject a fake
``napari`` package into sys.modules whose Viewer records opens and
exposes layer objects with real dtypes — exercising the FULL
view_output logic (plugin selection, wavelength->colormap resolution,
generated-colormap fallback, dtype contrast limits; reference
stitcher_gui.py:262-312, stitcher_process_gui.py:389-419).
"""

import os
import sys
import types

import numpy as np
import pytest

os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")

from image_stitcher_tpu import qt_compat
from image_stitcher_tpu.gui import CHANNEL_COLORS_MAP, StitchingGUI


class FakeLayer:
    def __init__(self, name, dtype):
        self.name = name
        self.data = np.zeros((4, 4), dtype)
        self.colormap = None
        self.contrast_limits = None


class FakeViewer:
    instances = []

    def __init__(self):
        self.opened = []
        self.layers = []
        FakeViewer.instances.append(self)

    def open(self, path, plugin=None):
        self.opened.append((path, plugin))
        # one layer per monochrome channel, like napari-ome-zarr
        self.layers.extend([
            FakeLayer("Fluorescence 405 nm Ex", np.uint16),
            FakeLayer("Fluorescence 561 nm Ex", np.uint16),
            FakeLayer("BF LED matrix full_R", np.uint8),
            FakeLayer("confidence", np.float32),   # no wavelength -> gray
        ])


class FakeColormap:
    def __init__(self, colors=None, name=None):
        self.colors = colors
        self.name = name


@pytest.fixture()
def fake_napari(monkeypatch):
    """A napari package stub: Viewer/run plus utils.Colormap and a
    colormap registry that only knows a subset of names (so the
    generated-colormap fallback path runs too)."""
    FakeViewer.instances.clear()
    napari = types.ModuleType("napari")
    napari.Viewer = FakeViewer
    napari.run = lambda: None
    utils = types.ModuleType("napari.utils")
    utils.Colormap = FakeColormap
    colormaps = types.ModuleType("napari.utils.colormaps")
    # 'blue'/'green'/'red'/'gray' exist; 'yellow' does not -> generated
    colormaps.AVAILABLE_COLORMAPS = {n: f"cmap:{n}"
                                     for n in ("blue", "green", "red", "gray")}
    napari.utils = utils
    utils.colormaps = colormaps
    monkeypatch.setitem(sys.modules, "napari", napari)
    monkeypatch.setitem(sys.modules, "napari.utils", utils)
    monkeypatch.setitem(sys.modules, "napari.utils.colormaps", colormaps)
    return napari


@pytest.fixture()
def qapp():
    app = qt_compat.QApplication.instance()
    if app is None:
        app = qt_compat.QApplication([])
    return app


def test_view_output_zarr_colormaps_and_contrast(fake_napari, qapp):
    gui = StitchingGUI()
    gui.output_path = "/tmp/out/A1_stitched.ome.zarr"
    gui.view_output()

    viewer = FakeViewer.instances[-1]
    # zarr path opens through the ome-zarr plugin
    assert viewer.opened == [(gui.output_path, 'napari-ome-zarr')]

    l405, l561, lred, lnone = viewer.layers
    # 405 -> named 'blue' straight from the registry
    assert l405.colormap == "cmap:blue"
    # 561 -> 'yellow' missing from the registry -> generated from hex
    assert isinstance(l561.colormap, FakeColormap)
    assert l561.colormap.name == "yellow"
    hexv = CHANNEL_COLORS_MAP['561']['hex']
    expect = [(hexv >> 16 & 0xFF) / 255.0, (hexv >> 8 & 0xFF) / 255.0,
              (hexv & 0xFF) / 255.0, 1.0]
    assert l561.colormap.colors[0] == [0.0, 0.0, 0.0, 1.0]
    assert np.allclose(l561.colormap.colors[1], expect)
    # _R suffix -> red
    assert lred.colormap == "cmap:red"
    # unknown name -> gray default
    assert lnone.colormap == "cmap:gray"

    # contrast limits follow each layer's dtype
    assert l405.contrast_limits == (0, 65535)
    assert lred.contrast_limits == (0, 255)
    assert lnone.contrast_limits == (0.0, 1.0)


def test_view_output_tiff_plain_open(fake_napari, qapp):
    gui = StitchingGUI()
    gui.output_path = "/tmp/out/A1_stitched.ome.tiff"
    gui.view_output()
    viewer = FakeViewer.instances[-1]
    assert viewer.opened == [(gui.output_path, None)]


def test_view_output_error_surfaces_dialog(fake_napari, qapp, monkeypatch):
    """A viewer failure lands in the error dialog, not a crash
    (reference stitcher_process_gui.py:417-419)."""
    def boom():
        raise RuntimeError("no display")
    monkeypatch.setattr(fake_napari, "Viewer", boom)
    gui = StitchingGUI()
    gui.output_path = "/tmp/out/A1_stitched.ome.zarr"
    if not qt_compat.HAVE_QT:
        qt_compat.QMessageBox.messages.clear()
        gui.view_output()
        assert any(m[0] == 'critical' and 'no display' in m[2]
                   for m in qt_compat.QMessageBox.messages)
    else:
        pytest.skip("modal dialog path exercised in headless mode")
