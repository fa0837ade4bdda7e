"""Round-4 decision-logic tests.

Compressor 'auto' disk gate: measured end-to-end on this class of host
(tools/ab_compressor.py, compressible fixture, interleaved best-of),
blosc-lz4 at achieved ratio 0.80 ran 27.4 s vs raw 5.4 s — compression
must clear BOTH a content gate (median zlib-1 probe ratio <= 0.6) and a
disk gate (output device slower than ~300 MB/s x cores) before it is
allowed to take the run off the raw O_DIRECT writer path.
"""
import numpy as np

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, StitchingParameters
from image_stitcher_tpu.io.acquisition import scan_acquisition
from image_stitcher_tpu.models.pipeline import StitchPipeline


def _auto_pipe(tmp_path):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=64, tile_h=64, overlap=16,
                                gt_gamma=40.0)  # compressible content
    p = StitchingParameters(input_folder=acq_dir)
    pipe = StitchPipeline(p, EngineOptions(compressor_cname='auto'))
    pipe.acq = scan_acquisition(acq_dir)
    return pipe


def test_compressor_auto_fast_disk_stays_raw(tmp_path, monkeypatch):
    """Compressible content + a disk that outruns the compressor ->
    raw chunks (shrinking bytes can't pay for burning the cores)."""
    from image_stitcher_tpu.params import _available_cpus
    ncores = _available_cpus()
    monkeypatch.setattr(StitchPipeline, '_probed_disk_mbps',
                        lambda self: max(1000.0, 400.0 * ncores))
    pipe = _auto_pipe(tmp_path)
    assert pipe.resolved_compressor()[0] is None


def test_compressor_auto_slow_disk_compresses(tmp_path, monkeypatch):
    """Compressible content + a genuinely slow disk -> blosc-lz4."""
    monkeypatch.setattr(StitchPipeline, '_probed_disk_mbps',
                        lambda self: 120.0)
    pipe = _auto_pipe(tmp_path)
    assert pipe.resolved_compressor() == ('lz4', 5, 1)


def test_compressor_auto_unprobed_disk_falls_back_to_content(
        tmp_path, monkeypatch):
    """A failed disk probe (None) must not block compression — the
    decision degrades to the content gate alone."""
    monkeypatch.setattr(StitchPipeline, '_probed_disk_mbps',
                        lambda self: None)
    pipe = _auto_pipe(tmp_path)
    assert pipe.resolved_compressor() == ('lz4', 5, 1)
