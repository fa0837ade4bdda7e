"""Streaming (bounded-memory) fusion vs the in-RAM path."""

import glob
import os

import numpy as np
import pytest

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array
from image_stitcher_tpu.models.streaming import band_rows_for


def test_band_rows_alignment():
    assert band_rows_for(2048, 1) == 2048
    assert band_rows_for(2048, 5) == 2048  # 2048 % 16 == 0
    assert band_rows_for(100, 4) == 104    # rounded to multiple of 8
    assert band_rows_for(100, 1) == 100


def _outputs(acq_dir):
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr")
    levels = sorted(d for d in os.listdir(zp) if d.isdigit())
    return {lv: np.asarray(open_zarr_array(os.path.join(zp, lv))
                           .read().result()) for lv in levels}


@pytest.mark.parametrize("use_registration", [False, True])
def test_streaming_matches_in_ram(tmp_path, use_registration):
    """Tiny chunks force many bands incl. band-spanning tiles; output
    must equal the in-RAM host path at every pyramid level."""
    results = {}
    for mode, chunks in (("on", (1, 1, 1, 64, 64)), ("off", (1, 1, 1, 64, 64))):
        acq_dir = str(tmp_path / f"acq_{mode}_{use_registration}")
        write_synthetic_acquisition(
            acq_dir, grid_cols=3, grid_rows=3, tile_w=96, tile_h=96,
            overlap=32, channels=["Fluorescence 488 nm Ex",
                                  "Fluorescence 561 nm Ex"], num_z=2,
            acq_params_overrides={"pixel_binning": 2})
        stitch(acq_dir, use_registration=use_registration,
               apply_flatfield=True,
               options=EngineOptions(streaming=mode, chunks=chunks,
                                     fusion_device='host'))
        results[mode] = _outputs(acq_dir)
    assert results["on"].keys() == results["off"].keys()
    for lv in results["on"]:
        np.testing.assert_array_equal(results["on"][lv], results["off"][lv])


def test_streaming_stage_cpu_accounting(tmp_path):
    """The fuser reports per-stage ON-CORE time alongside wall sums:
    every wall-summed stage has a CPU twin, each CPU sum is bounded by
    its wall sum (thread_time <= wall per segment), and the status line
    reaches the reporter (bench captures decompose the CPU floor from
    it)."""
    from image_stitcher_tpu import ProgressReporter, stitch

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=96, tile_h=96, overlap=32)
    lines = []
    pipe = stitch(acq_dir, apply_flatfield=True,
                  reporter=ProgressReporter(
                      status=lambda m, s=False: lines.append(m)),
                  options=EngineOptions(streaming='on',
                                        chunks=(1, 1, 1, 64, 64),
                                        fusion_device='host'))
    assert pipe is not None
    assert any(m.startswith("stream cpu:") for m in lines)
    # parse the reported lines instead of reaching into pipeline internals
    cpu_line = next(m for m in lines if m.startswith("stream cpu:"))
    wall_line = next(m for m in lines if m.startswith("stream stages:"))

    def parse(line):
        return {kv.split("=")[0]: float(kv.split("=")[1][:-1])
                for kv in line.split(":", 1)[1].split()}

    cpu, wall = parse(cpu_line), parse(wall_line)
    for key in ("decode", "place", "fill", "write"):
        assert key in cpu, key
        assert cpu[key] >= 0.0
    for key, v in cpu.items():
        if key in wall:
            # small epsilon: thread_time and perf_counter are separate
            # clocks; segments are many and short on this tiny fixture
            assert v <= wall[key] + 0.25, (key, v, wall[key])


def test_streaming_auto_threshold(tmp_path):
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    # threshold of 0 bytes -> always streams
    pipe = stitch(acq_dir, options=EngineOptions(
        streaming='auto', streaming_threshold_bytes=0))
    assert 'stream_fuse_save' in pipe.timers.totals
    # huge threshold -> in-RAM path
    acq_dir2 = str(tmp_path / "acq2")
    write_synthetic_acquisition(acq_dir2, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    pipe2 = stitch(acq_dir2, options=EngineOptions(streaming='auto'))
    assert 'stream_fuse_save' not in pipe2.timers.totals


def test_streaming_multi_timepoint_merge(tmp_path):
    """Streaming outputs feed the merge passes like any other."""
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=48, tile_h=48, overlap=16,
                                timepoints=2)
    stitch(acq_dir, merge_timepoints=True,
           options=EngineOptions(streaming='on'))
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    ts = os.path.join(out, "region_time_series", "A1_time_series.ome.zarr")
    data = np.asarray(open_zarr_array(os.path.join(ts, "0")).read().result())
    assert data.shape[0] == 2


def test_streaming_feather_matches_in_ram(tmp_path):
    """Feathered streaming (band accumulators, full-window ramps) must
    match the in-RAM feather path within rounding."""
    results = {}
    for mode in ("on", "off"):
        acq_dir = str(tmp_path / f"fth_{mode}")
        write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                    tile_w=96, tile_h=96, overlap=32)
        stitch(acq_dir, options=EngineOptions(
            streaming=mode, blend_method='feather',
            chunks=(1, 1, 1, 64, 64), fusion_device='host'))
        results[mode] = _outputs(acq_dir)
    for lv in results["on"]:
        a = results["on"][lv].astype(int)
        b = results["off"][lv].astype(int)
        assert np.abs(a - b).max() <= 1


def test_device_streaming_writer_error_surfaces(tmp_path, monkeypatch):
    """A band-write failure on the DeviceStreamingFuser's background
    writer thread must surface as the run's exception (not hang the
    fuse loop or pass silently). r3: band writes moved off the fusion
    thread so the device fuses band N+1 while band N drains."""
    import image_stitcher_tpu.models.streaming as streaming_mod

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)

    real = streaming_mod.write_band_levels

    def boom(writer, c, z, band0, *a, **k):
        raise OSError("disk gone")

    monkeypatch.setattr(streaming_mod, "write_band_levels", boom)
    with pytest.raises(Exception) as ei:
        stitch(acq_dir, options=EngineOptions(
            streaming='on', fusion_device='device',
            chunks=(1, 1, 1, 32, 32)))
    # surfaced either directly or wrapped by the engine's error path
    assert "disk gone" in str(ei.value) or isinstance(ei.value, OSError)
    monkeypatch.setattr(streaming_mod, "write_band_levels", real)


def test_device_streaming_cancel_joins_writer(tmp_path):
    """Cancelling MID-FUSION raises StitchCancelled and leaves no live
    band-writer thread behind. The stop trips on the first fusion
    progress tick — after DeviceStreamingFuser.run() has started the
    writer thread — so the cancel path through the band loop's
    stop_check, the sentinel put, and wt.join() actually executes
    (a pre-set stop would cancel in an earlier stage and never create
    the thread). band_multiple=1 keeps bands at 32 rows so the
    2x2/64px canvas spans >1 band and a later band's stop_check
    always runs after the tick."""
    import threading

    from image_stitcher_tpu.utils.progress import (ProgressReporter,
                                                   StitchCancelled)

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    stop = threading.Event()
    saw_writer = []

    def on_progress(cur, total):
        saw_writer.append(any(t.name == 'band-writer'
                              for t in threading.enumerate()))
        stop.set()

    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu.params import StitchingParameters
    params = StitchingParameters(input_folder=acq_dir)
    pipe = StitchPipeline(params, EngineOptions(
        streaming='on', fusion_device='device', chunks=(1, 1, 1, 32, 32),
        device_band_multiple=1),
        reporter=ProgressReporter(update_progress=on_progress),
        stop_event=stop)
    with pytest.raises(StitchCancelled):
        pipe.run()
    # the tick fired inside the fuser, with the writer thread live
    assert saw_writer and saw_writer[0]
    for _ in range(50):
        if not any(t.name == 'band-writer' for t in threading.enumerate()):
            break
        import time
        time.sleep(0.1)
    assert not any(t.name == 'band-writer' for t in threading.enumerate())


def test_flatfield_gate_semantics():
    """Unit: per-channel publish/wait, identity rows, error re-raise
    with the original exception TYPE (stop classification depends on
    it)."""
    import threading

    from image_stitcher_tpu.models.streaming import FlatfieldGate
    from image_stitcher_tpu.utils.progress import StitchCancelled

    g = FlatfieldGate(3, (4, 4))
    field = np.full((4, 4), 2.0, np.float32)
    g.publish(0, field)
    r = g.wait(0)
    np.testing.assert_allclose(r[0], 0.5)
    # channel 1 not yet published: wait would block; finish releases it
    # with the identity reciprocal
    assert not g._events[1].is_set()
    g.finish()
    np.testing.assert_array_equal(g.wait(1)[1], np.ones((4, 4), np.float32))

    g2 = FlatfieldGate(2, (4, 4))
    waiter_err = []

    def waits():
        try:
            g2.wait(1)
        except BaseException as e:
            waiter_err.append(e)

    t = threading.Thread(target=waits)
    t.start()
    g2.fail(StitchCancelled("stop"))
    t.join(5)
    assert not t.is_alive()
    assert isinstance(waiter_err[0], StitchCancelled)


def test_gated_flatfield_matches_ungated(tmp_path):
    """The per-channel gate (overlap_prep on, fusion starts while later
    channels still fit) must be byte-identical to the fully serial fit
    (overlap_prep off), registration off so the gate is the ONLY
    overlap in play."""
    results = {}
    for mode in (True, False):
        acq_dir = str(tmp_path / f"acq_{mode}")
        write_synthetic_acquisition(
            acq_dir, grid_cols=3, grid_rows=3, tile_w=96, tile_h=96,
            overlap=32, channels=["Fluorescence 488 nm Ex",
                                  "Fluorescence 561 nm Ex",
                                  "Fluorescence 638 nm Ex"],
            vignette=np.clip(1.0 - 0.4 * np.hypot(
                *np.meshgrid(np.linspace(-1, 1, 96),
                             np.linspace(-1, 1, 96))), 0.3, 1.0
                             ).astype(np.float32))
        stitch(acq_dir, apply_flatfield=True, use_registration=False,
               options=EngineOptions(streaming='on',
                                     chunks=(1, 1, 1, 64, 64),
                                     fusion_device='host',
                                     overlap_prep=mode))
        results[mode] = _outputs(acq_dir)
    for lv in results[True]:
        np.testing.assert_array_equal(results[True][lv], results[False][lv])


def test_gated_flatfield_fit_failure_surfaces(tmp_path, monkeypatch):
    """A fit that dies mid-run must unblock gated fusion bands and
    surface (no hang, no partial success)."""
    import image_stitcher_tpu.ops.flatfield as ffmod

    def boom(*a, **k):
        raise RuntimeError("fit exploded")

    monkeypatch.setattr(ffmod, "fit_flatfield_stack_np", boom)
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16)
    with pytest.raises(RuntimeError, match="fit exploded"):
        stitch(acq_dir, apply_flatfield=True, use_registration=False,
               options=EngineOptions(streaming='on',
                                     chunks=(1, 1, 1, 32, 32),
                                     fusion_device='host'))


def test_block_mode_matches_row_mode(tmp_path):
    """Chunk-column block banding (one contiguous pwrite per chunk) must
    produce byte-identical stores to the row-major band path, including
    pyramid levels assembled from per-block downsamples."""
    import filecmp

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=96, tile_h=96, overlap=32,
                                num_z=2)
    from image_stitcher_tpu.models import streaming as st

    outs = {}
    for mode in ("block", "row"):
        if mode == "row":
            orig = st.StreamingFuser.__init__

            def no_blocks(self, *a, **k):
                orig(self, *a, **k)
                self._block_cx = 0

            st.StreamingFuser.__init__ = no_blocks
        try:
            stitch(acq_dir, apply_flatfield=True,
                   options=EngineOptions(streaming='on',
                                         chunks=(1, 1, 1, 64, 64),
                                         fusion_device='host'))
        finally:
            if mode == "row":
                st.StreamingFuser.__init__ = orig
        out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
        outs[mode] = os.path.join(out, "0_stitched",
                                  "A1_stitched.ome.zarr")

    files_b = sorted(os.path.relpath(os.path.join(r, f), outs["block"])
                     for r, _, fs in os.walk(outs["block"]) for f in fs)
    files_r = sorted(os.path.relpath(os.path.join(r, f), outs["row"])
                     for r, _, fs in os.walk(outs["row"]) for f in fs)
    assert files_b == files_r and files_b
    for rel in files_b:
        if rel.endswith((".zattrs", ".zgroup")):
            continue
        assert filecmp.cmp(os.path.join(outs["block"], rel),
                           os.path.join(outs["row"], rel),
                           shallow=False), rel


def test_block_mode_declines_odd_chunk_width(tmp_path):
    """Odd chunk widths must NOT take block mode: pyramid level 1 is
    assembled from per-block downsamples whose 2-column windows would
    straddle odd block boundaries. The row path serves them (and the
    output still matches the in-RAM fuser)."""
    import numpy as np

    from image_stitcher_tpu.io.omezarr import MultiscaleWriter
    from image_stitcher_tpu.models.streaming import StreamingFuser

    w = MultiscaleWriter(str(tmp_path / "x.ome.zarr"),
                         (1, 1, 1, 250, 250), 3, np.uint16,
                         (1, 1, 1, 64, 63), "t", 1.0, 1.0,
                         ["c"], [0xFFFFFF], cname=None)
    f = StreamingFuser(w, 1, 1, 250, 250, 96, 96, np.uint16, 3,
                       chunk_rows=64)
    assert f._block_cx == 0
    w.close()

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=96, tile_h=96, overlap=32)
    stitch(acq_dir, apply_flatfield=True,
           options=EngineOptions(streaming='on', chunks=(1, 1, 1, 64, 63),
                                 fusion_device='host'))
    stream_out = _outputs(acq_dir)
    acq2 = str(tmp_path / "acq2")
    write_synthetic_acquisition(acq2, grid_cols=3, grid_rows=3,
                                tile_w=96, tile_h=96, overlap=32)
    stitch(acq2, apply_flatfield=True,
           options=EngineOptions(streaming='off', chunks=(1, 1, 1, 64, 63),
                                 fusion_device='host'))
    ram_out = _outputs(acq2)
    for lv in stream_out:
        np.testing.assert_array_equal(stream_out[lv], ram_out[lv])


def test_block_mode_matches_row_mode_v3(tmp_path):
    """Same store-file parity for zarr v3 sharded output (shard bodies
    + index bytes identical between block and row banding)."""
    import filecmp

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                tile_w=96, tile_h=96, overlap=32)
    from image_stitcher_tpu.models import streaming as st

    outs = {}
    for mode in ("block", "row"):
        if mode == "row":
            orig = st.StreamingFuser.__init__

            def no_blocks(self, *a, **k):
                orig(self, *a, **k)
                self._block_cx = 0

            st.StreamingFuser.__init__ = no_blocks
        try:
            stitch(acq_dir, apply_flatfield=True,
                   options=EngineOptions(streaming='on', zarr_format=3,
                                         chunks=(1, 1, 1, 64, 64),
                                         fusion_device='host'))
        finally:
            if mode == "row":
                st.StreamingFuser.__init__ = orig
        out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
        outs[mode] = os.path.join(out, "0_stitched",
                                  "A1_stitched.ome.zarr")

    files_b = sorted(os.path.relpath(os.path.join(r, f), outs["block"])
                     for r, _, fs in os.walk(outs["block"]) for f in fs)
    files_r = sorted(os.path.relpath(os.path.join(r, f), outs["row"])
                     for r, _, fs in os.walk(outs["row"]) for f in fs)
    assert files_b == files_r and files_b
    for rel in files_b:
        if rel.endswith(("zarr.json",)):
            continue
        assert filecmp.cmp(os.path.join(outs["block"], rel),
                           os.path.join(outs["row"], rel),
                           shallow=False), rel


# ------------------------------------------------- band fill-skip coverage


def _covered(jobs, band0, rows, *, h=200, w=300, th=100, tw=100):
    """Drive StreamingFuser._band_covered on a minimal stand-in self."""
    from types import SimpleNamespace
    import image_stitcher_tpu.models.streaming as st
    self_like = SimpleNamespace(tile_h=th, tile_w=tw, height=h, width=w,
                                _nominal_dims_ok=True)
    wrapped = [(SimpleNamespace(y=y, x=x, crops=crops), True)
               for y, x, crops in jobs]
    return st.StreamingFuser._band_covered(self_like, wrapped, band0, rows)


def test_band_covered_geometry():
    z = (0, 0, 0, 0)
    # 2x3 grid of 100^2 tiles tiles a 200x300 band exactly
    grid = [(y, x, z) for y in (0, 100) for x in (0, 100, 200)]
    assert _covered(grid, 0, 200)
    assert _covered(grid, 100, 100)      # lower band alone
    # a missing tile opens a gap
    assert not _covered(grid[:-1], 0, 200)
    assert not _covered(grid[:-1], 100, 100)
    # the gap in the OTHER band doesn't break this band
    assert _covered([j for j in grid if j[0] == 0], 0, 100)
    # overlapping tiles still cover
    over = [(y, x, z) for y in (0, 80) for x in (0, 80, 160, 200)]
    assert _covered(over, 0, 180)
    # crops shrink the rect: a cropped column opens a seam
    cropped = list(grid)
    cropped[1] = (0, 100, (0, 0, 5, 0))  # left crop on the middle tile
    assert not _covered(cropped, 0, 100)
    # ...unless a neighbor overlaps past the seam
    cropped[0] = (0, -5, z)              # negative x -> rect discarded
    assert not _covered(cropped, 0, 100)
    # empty band
    assert not _covered([], 0, 100)


def test_streaming_dirty_pool_reuse_byte_parity(tmp_path):
    """Fill-skip adversary: tiny chunk rows force MANY bands per thread,
    so the pooled band buffer is reused dirty across bands/z/channels
    with DIFFERENT content. Fully-covered bands skip the zero fill; the
    output must still be byte-identical to the materialized device
    canvas."""
    results = {}
    for backend in ("host", "device"):
        acq = str(tmp_path / f"acq_{backend}")
        write_synthetic_acquisition(acq, grid_cols=3, grid_rows=3,
                                    tile_w=96, tile_h=96, overlap=32,
                                    channels=["Fluorescence 488 nm Ex",
                                              "Fluorescence 561 nm Ex"],
                                    num_z=2)
        stitch(acq, apply_flatfield=True,
               options=EngineOptions(
                   streaming='on' if backend == 'host' else 'off',
                   chunks=(1, 1, 1, 32, 32),
                   fusion_device=backend, fusion_batch=4))
        out = sorted(glob.glob(acq + "_stitched_*"))[-1]
        zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr", "0")
        results[backend] = np.asarray(open_zarr_array(zp).read().result())
    np.testing.assert_array_equal(results['host'], results['device'])


def test_streaming_undersized_tile_triggers_zeroed_replay(tmp_path):
    """A tile smaller than nominal breaks the coverage proof behind the
    fill skip; the band must zero itself and replay, ending byte-equal
    to the in-RAM HostCanvas (which clamps to actual shapes natively)."""
    import cv2

    results = {}
    for mode in ("on", "off"):
        acq = str(tmp_path / f"acq_{mode}")
        write_synthetic_acquisition(acq, grid_cols=3, grid_rows=3,
                                    tile_w=96, tile_h=96, overlap=32)
        # shrink the CENTER tile's file: its nominal rect goes uncovered
        from image_stitcher_tpu.io.acquisition import (read_image,
                                                       scan_acquisition)
        a = scan_acquisition(acq)
        keys = sorted(a.tiles.keys())
        center = a.tiles[keys[len(keys) // 2]].filepath
        small = read_image(center)[:64, :64].copy()
        assert cv2.imwrite(center, small,
                           [int(cv2.IMWRITE_TIFF_COMPRESSION), 1])
        stitch(acq, options=EngineOptions(streaming=mode,
                                          chunks=(1, 1, 1, 32, 32),
                                          fusion_device='host'))
        out = sorted(glob.glob(acq + "_stitched_*"))[-1]
        zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr", "0")
        results[mode] = np.asarray(open_zarr_array(zp).read().result())
    np.testing.assert_array_equal(results['on'], results['off'])


def test_band_covered_disabled_after_nominal_mismatch():
    """Once a loaded tile contradicts the nominal dims, every later
    coverage proof is declined up front (one replay, not one per band)."""
    from types import SimpleNamespace
    import image_stitcher_tpu.models.streaming as st
    s = SimpleNamespace(tile_h=100, tile_w=100, height=100, width=100,
                        _nominal_dims_ok=True)
    jobs = [(SimpleNamespace(y=0, x=0, crops=(0, 0, 0, 0)), True)]
    assert st.StreamingFuser._band_covered(s, jobs, 0, 100)
    s._nominal_dims_ok = False
    assert not st.StreamingFuser._band_covered(s, jobs, 0, 100)
