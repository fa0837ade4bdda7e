import glob
import os

import numpy as np

from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array
from image_stitcher_tpu.ops.host_fuse import HostCanvas, host_downsample
from image_stitcher_tpu.ops.pyramid import downsample
import jax.numpy as jnp

from fixtures import write_synthetic_acquisition


def test_host_canvas_matches_reference_semantics(rng):
    H = W = 64
    hc = HostCanvas(2, 1, H, W, np.uint16, num_threads=4)
    ref = np.zeros((2, 1, H, W), np.uint16)
    jobs = []
    for i in range(12):
        tile = rng.integers(0, 65535, (16, 16), dtype=np.uint16)
        c = int(rng.integers(0, 2))
        y, x = int(rng.integers(0, H - 4)), int(rng.integers(0, W - 4))
        crops = tuple(int(v) for v in rng.integers(0, 4, 4))
        jobs.append((tile, c, 0, y, x, crops))
        top, bottom, left, right = crops
        t = tile[top:16 - bottom if bottom else 16,
                 left:16 - right if right else 16]
        yy, xx = y + top, x + left
        ye, xe = min(yy + t.shape[0], H), min(xx + t.shape[1], W)
        ref[c, 0, yy:ye, xx:xe] = t[:ye - yy, :xe - xx]
    hc.fuse(jobs)
    np.testing.assert_array_equal(hc.finalize(), ref)


def test_host_canvas_flatfield():
    # correction multiplies by the reciprocal field: recip 0.5 == /2
    hc = HostCanvas(1, 1, 8, 8, np.uint16,
                    ff_recip=np.full((1, 4, 4), 0.5, np.float32))
    hc.fuse([(np.full((4, 4), 1000, np.uint16), 0, 0, 0, 0, (0, 0, 0, 0))])
    out = hc.finalize()
    assert out[0, 0, 0, 0] == 500


def test_host_downsample_matches_device(rng):
    x = rng.integers(0, 65535, (1, 2, 1, 33, 47), dtype=np.uint16)
    for mode in ('nearest', 'mean'):
        np.testing.assert_array_equal(
            host_downsample(x, mode), np.asarray(downsample(jnp.asarray(x), mode)))


def test_host_downsample_out_strided_columns(rng):
    """out= fills strided column slices of a pooled band byte-identically
    to the concatenate-of-copies path it replaces (streaming.py block
    banding), for both kernels and both dtypes."""
    import pytest
    for dtype in (np.uint16, np.uint8):
        hi = np.iinfo(dtype).max
        blocks = rng.integers(0, hi, (3, 34, 48), dtype=dtype)
        for mode in ('nearest', 'mean'):
            ref = np.concatenate([host_downsample(blocks[i], mode)
                                  for i in range(3)], axis=1)
            pool = np.zeros((17, 3 * 24 + 5), dtype)  # wider than needed
            for i in range(3):
                got = host_downsample(blocks[i], mode,
                                      out=pool[:, i * 24:(i + 1) * 24])
                assert got.base is pool or got is pool
            np.testing.assert_array_equal(pool[:, :72], ref)
    # float falls through to the NumPy mean path; out must still be honored
    xf = rng.random((10, 12)).astype(np.float32)
    outf = np.empty((5, 6), np.float32)
    assert host_downsample(xf, 'mean', out=outf) is outf
    np.testing.assert_array_equal(outf, host_downsample(xf, 'mean'))
    # mismatched out is an error, never silently ignored
    with pytest.raises(ValueError):
        host_downsample(xf, 'mean', out=np.empty((4, 6), np.float32))
    with pytest.raises(ValueError):
        host_downsample(xf, 'mean', out=np.empty((5, 6), np.float64))


def test_host_vs_device_e2e_identical(tmp_path):
    """The two fusion backends must produce byte-identical zarr output."""
    results = {}
    for backend in ('host', 'device'):
        acq_dir = str(tmp_path / f"acq_{backend}")
        write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=2,
                                    tile_w=96, tile_h=96, overlap=24,
                                    channels=["Fluorescence 488 nm Ex",
                                              "Fluorescence 561 nm Ex"],
                                    num_z=2)
        stitch(acq_dir, options=EngineOptions(fusion_device=backend,
                                              fusion_batch=5))
        out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
        zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr", "0")
        results[backend] = np.asarray(open_zarr_array(zp).read().result())
    np.testing.assert_array_equal(results['host'], results['device'])


def test_host_feather_close_to_device(tmp_path):
    results = {}
    for backend in ('host', 'device'):
        acq_dir = str(tmp_path / f"f_{backend}")
        write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                    tile_w=64, tile_h=64, overlap=16)
        stitch(acq_dir, options=EngineOptions(fusion_device=backend,
                                              blend_method='feather'))
        out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
        zp = os.path.join(out, "0_stitched", "A1_stitched.ome.zarr", "0")
        results[backend] = np.asarray(open_zarr_array(zp).read().result())
    diff = np.abs(results['host'].astype(int) - results['device'].astype(int))
    assert diff.max() <= 1  # f32 accumulation rounding only


def test_autotune_choose_backend():
    from image_stitcher_tpu.parallel.autotune import choose_fusion_backend
    fast = {'h2d_mbps': 10000.0, 'd2h_mbps': 10000.0}
    slow = {'h2d_mbps': 140.0, 'd2h_mbps': 40.0}
    gb = 1 << 30
    assert choose_fusion_backend(3 * gb, 2 * gb, fast,
                                 host_bps=1.2e9) == 'device'
    assert choose_fusion_backend(3 * gb, 2 * gb, slow,
                                 host_bps=1.2e9) == 'host'


def test_autotune_host_rate_flips_choice():
    """The backend choice must use the MEASURED host rate: on a
    marginal link, a fast host flips the decision to host fusion and a
    starved host flips it to device (VERDICT r2 weak #4 — the old code
    hard-coded 1.2 GB/s)."""
    from image_stitcher_tpu.parallel.autotune import choose_fusion_backend
    link = {'h2d_mbps': 2000.0, 'd2h_mbps': 2000.0}
    gb = 1 << 30
    # device_s = 2/2000MiB/s + 3/2000MiB/s ~ 2.56s; host_s = 4GB/host
    assert choose_fusion_backend(3 * gb, 2 * gb, link,
                                 host_bps=8e9) == 'host'
    assert choose_fusion_backend(3 * gb, 2 * gb, link,
                                 host_bps=0.5e9) == 'device'


def test_probe_host_bandwidth_measures_and_caches(tmp_path, monkeypatch):
    """The host probe returns a plausible measured rate and persists it
    beside the link probe; a second call reads the cache."""
    from image_stitcher_tpu.parallel import autotune
    monkeypatch.setattr(autotune, '_PROBE_FILE',
                        str(tmp_path / 'linkprobe.json'))
    monkeypatch.setattr(autotune, '_HOST_PROBE_CACHE', None)
    rate = autotune.probe_host_bandwidth(size_mb=4, force=True)
    # 1 MB/s .. 1 TB/s: a real memory rate. The lower bound is loose on
    # purpose — this shared host's scheduler has starved the probe below
    # 10 MB/s mid-suite (observed 2026-08-18), and the test asserts
    # plausibility + caching, not the machine's mood.
    assert 1e6 < rate < 1e12
    import json
    saved = json.loads((tmp_path / 'linkprobe.json').read_text())
    assert saved['host_bps'] == rate
    # cached path: poison the file; in-process cache must win
    monkeypatch.setattr(autotune, '_HOST_PROBE_CACHE', 123.0)
    assert autotune.probe_host_bandwidth(size_mb=4) == 123.0


def test_link_probe_cache_hit_needs_no_jax(tmp_path, monkeypatch):
    """A fresh per-backend cache entry is served without running the
    jax probe — initializing a stalled remote runtime just to re-learn
    the backend name has hung the all-host pipeline forever."""
    import json
    import time
    from image_stitcher_tpu.parallel import autotune
    path = tmp_path / 'linkprobe.json'
    backend = autotune._expected_backend()
    assert backend is not None  # conftest initializes jax on cpu
    path.write_text(json.dumps({'links': {backend: {
        'h2d_mbps': 111.0, 'd2h_mbps': 222.0, 'ts': time.time()}}}))
    monkeypatch.setattr(autotune, '_PROBE_FILE', str(path))
    monkeypatch.setattr(autotune, '_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_run_probe',
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("probe must not run")))
    assert autotune.probe_link_bandwidth() == {'h2d_mbps': 111.0,
                                               'd2h_mbps': 222.0}


def test_link_probe_other_backend_entry_is_ignored(tmp_path, monkeypatch):
    """A CPU-run probe must never drive a TPU run's placement decision:
    an entry for a different backend misses the cache."""
    import json
    import time
    from image_stitcher_tpu.parallel import autotune
    path = tmp_path / 'linkprobe.json'
    path.write_text(json.dumps({'links': {'somewhere-else': {
        'h2d_mbps': 1.0, 'd2h_mbps': 1.0, 'ts': time.time()}}}))
    monkeypatch.setattr(autotune, '_PROBE_FILE', str(path))
    monkeypatch.setattr(autotune, '_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_run_probe',
                        lambda *a, **k: ('cpu', {'h2d_mbps': 9.0,
                                                 'd2h_mbps': 9.0}))
    assert autotune.probe_link_bandwidth()['h2d_mbps'] == 9.0


def test_link_probe_deadline_returns_dead_link(tmp_path, monkeypatch):
    """A probe that stalls past the deadline (storm-stalled tunnel — the
    subprocess is killed and _run_probe returns None) yields DEAD_LINK —
    forcing host fusion — instead of hanging, and does not poison the
    disk cache with the transient failure."""
    import json
    from image_stitcher_tpu.parallel import autotune
    path = tmp_path / 'linkprobe.json'
    before = json.dumps({'links': {}})
    path.write_text(before)
    monkeypatch.setattr(autotune, '_PROBE_FILE', str(path))
    monkeypatch.setattr(autotune, '_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_run_probe', lambda *a, **k: None)
    assert autotune.probe_link_bandwidth() == autotune.DEAD_LINK
    assert path.read_text() == before
    # DEAD_LINK routes fusion to the host
    from image_stitcher_tpu.parallel.autotune import choose_fusion_backend
    assert choose_fusion_backend(1 << 30, 1 << 30, autotune.DEAD_LINK,
                                 host_bps=1e9) == 'host'


def test_link_probe_alias_canonicalization(tmp_path, monkeypatch):
    """Cache keys are canonical platform names: an env alias (axon ->
    tpu) must hit an entry recorded by jax.default_backend(), which
    always reports the canonical name (r3 review finding: the alias
    mismatch made the cache permanently miss on exactly the tunneled
    deployment it exists for)."""
    import json
    import time
    from image_stitcher_tpu.parallel import autotune
    assert autotune._canonical('axon') == 'tpu'
    path = tmp_path / 'linkprobe.json'
    path.write_text(json.dumps({'links': {'tpu': {
        'h2d_mbps': 5.0, 'd2h_mbps': 6.0, 'ts': time.time()}}}))
    monkeypatch.setattr(autotune, '_PROBE_FILE', str(path))
    monkeypatch.setattr(autotune, '_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_live_backend', lambda: None)
    monkeypatch.setenv('JAX_PLATFORMS', 'axon')
    monkeypatch.setattr(autotune, '_run_probe',
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("probe must not run")))
    assert autotune.probe_link_bandwidth() == {'h2d_mbps': 5.0,
                                               'd2h_mbps': 6.0}


def test_link_probe_legacy_flat_format_migrates(tmp_path, monkeypatch):
    """A pre-r3 flat cache file still serves its entry (migrated into
    the per-backend layout) and the stale flat keys are dropped on the
    next rewrite."""
    import json
    import time
    from image_stitcher_tpu.parallel import autotune
    path = tmp_path / 'linkprobe.json'
    path.write_text(json.dumps({
        'h2d_mbps': 3.0, 'd2h_mbps': 4.0, 'ts': time.time(),
        'backend': 'axon', 'host_bps': 7e8, 'host_ts': time.time()}))
    monkeypatch.setattr(autotune, '_PROBE_FILE', str(path))
    monkeypatch.setattr(autotune, '_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_HOST_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_live_backend', lambda: None)
    monkeypatch.setenv('JAX_PLATFORMS', 'axon')
    monkeypatch.setattr(autotune, '_run_probe',
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("probe must not run")))
    assert autotune.probe_link_bandwidth() == {'h2d_mbps': 3.0,
                                               'd2h_mbps': 4.0}
    assert autotune.probe_host_bandwidth() == 7e8
    # a rewrite (e.g. a fresh host probe) drops the flat link keys
    autotune._HOST_PROBE_CACHE = None
    autotune.probe_host_bandwidth(size_mb=2, force=True)
    saved = json.loads(path.read_text())
    assert 'links' in saved and 'tpu' in saved['links']
    assert 'backend' not in saved and 'h2d_mbps' not in saved


def test_link_probe_stale_default_backend_never_pins(tmp_path, monkeypatch):
    """The cached default_backend is a lookup hint only: when its entry
    is expired, the probe child must run UNPINNED (a stale pin to a
    platform that no longer exists would fail every probe forever and
    lock the machine into host fusion)."""
    import json
    from image_stitcher_tpu.parallel import autotune
    path = tmp_path / 'linkprobe.json'
    path.write_text(json.dumps({
        'default_backend': 'ghost',
        'links': {'ghost': {'h2d_mbps': 1.0, 'd2h_mbps': 1.0, 'ts': 0}}}))
    monkeypatch.setattr(autotune, '_PROBE_FILE', str(path))
    monkeypatch.setattr(autotune, '_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_live_backend', lambda: None)
    monkeypatch.delenv('JAX_PLATFORMS', raising=False)
    pins = []

    def fake_probe(size_mb, deadline, platform=None):
        pins.append(platform)
        return ('cpu', {'h2d_mbps': 8.0, 'd2h_mbps': 8.0})

    monkeypatch.setattr(autotune, '_run_probe', fake_probe)
    assert autotune.probe_link_bandwidth()['h2d_mbps'] == 8.0
    assert pins == [None]
    # the successful env-less probe rewrites the default hint
    assert json.loads(path.read_text())['default_backend'] == 'cpu'


def test_link_probe_env_list_passes_whole_list(monkeypatch, tmp_path):
    """JAX_PLATFORMS='tpu,cpu' pins the child to the full fallback
    chain, not just the first entry — the parent may be running the
    fallback."""
    from image_stitcher_tpu.parallel import autotune
    monkeypatch.setattr(autotune, '_PROBE_FILE',
                        str(tmp_path / 'linkprobe.json'))
    monkeypatch.setattr(autotune, '_PROBE_CACHE', None)
    monkeypatch.setattr(autotune, '_live_backend', lambda: None)
    monkeypatch.setenv('JAX_PLATFORMS', 'tpu,cpu')
    pins = []

    def fake_probe(size_mb, deadline, platform=None):
        pins.append(platform)
        return ('cpu', {'h2d_mbps': 8.0, 'd2h_mbps': 8.0})

    monkeypatch.setattr(autotune, '_run_probe', fake_probe)
    autotune.probe_link_bandwidth()
    assert pins == ['tpu,cpu']


def test_link_probe_child_failure_is_logged(caplog):
    """A failing probe child (not a timeout) logs its stderr instead of
    silently reading as a dead link."""
    import logging
    from image_stitcher_tpu.parallel import autotune
    with caplog.at_level(logging.WARNING,
                         logger='image_stitcher_tpu.autotune'):
        out = autotune._run_probe(1, 120.0,
                                  platform='no-such-platform-xyz')
    assert out is None
    assert any('link probe failed' in r.message for r in caplog.records)


def test_link_probe_subprocess_kill_deadline():
    """The real _run_probe enforces its deadline with a subprocess kill:
    a child that never answers is reaped within the deadline (plus
    startup slack), not waited on forever."""
    import time as _time
    from image_stitcher_tpu.parallel import autotune
    t0 = _time.perf_counter()
    # a deadline shorter than interpreter startup guarantees the kill
    assert autotune._run_probe(1, 0.01) is None
    assert _time.perf_counter() - t0 < 10.0


def test_correct_tile_undersized_numpy_fallback():
    """The NumPy twin must correct an undersized edge tile by the
    matching window of the nominal-size reciprocal field (it used to
    raise a broadcast ValueError when the native kernel was absent)."""
    from image_stitcher_tpu.ops.host_fuse import correct_tile
    rng = np.random.default_rng(3)
    ff = (rng.random((2, 64, 64)) * 0.8 + 0.6).astype(np.float32)
    tile = rng.integers(0, 65535, (48, 40), dtype=np.uint16)
    out = correct_tile(tile, ff, 1, np.dtype(np.uint16))
    assert out.shape == (48, 40)
    expect = np.clip(tile * ff[1][:48, :40], 0, 65535).astype(np.uint16)
    np.testing.assert_array_equal(out, expect)


def test_dispatch_crossover_model():
    from image_stitcher_tpu.parallel import autotune
    from image_stitcher_tpu.parallel.autotune import (
        device_stage_wall_s, min_work_per_dispatch_s)
    # r5 tunnel: rtt 52 ms, S=50 -> ~53 ms of host work per dispatch
    assert 0.052 < min_work_per_dispatch_s(0.052, 50.0) < 0.055
    # DMA-attached: sub-ms bar
    assert min_work_per_dispatch_s(1e-4, 10.0) < 2e-4
    # no speedup -> never worth a dispatch
    assert min_work_per_dispatch_s(0.05, 1.0) == float('inf')

    # wall model: dead link makes any device stage absurd
    dead = dict(autotune.DEAD_LINK)
    wall = device_stage_wall_s(1 << 20, 1 << 20, 3, 0.01, probe=dead)
    assert wall > 90  # 3 dispatches x 30 s rtt alone
    # healthy DMA link: dominated by the compute term
    fast = {'h2d_mbps': 10000.0, 'd2h_mbps': 10000.0, 'rtt_s': 1e-4}
    wall = device_stage_wall_s(1 << 30, 1 << 30, 10, 0.05, probe=fast)
    assert wall < 0.3


def test_probe_cache_round_trips_rtt(tmp_path, monkeypatch):
    """A cache entry carrying rtt_s serves it back; a pre-r5 entry
    without one still serves (no KeyError)."""
    import json, time as _time
    from image_stitcher_tpu.parallel import autotune
    path = str(tmp_path / "probe.json")
    monkeypatch.setattr(autotune, "_PROBE_FILE", path)
    monkeypatch.setattr(autotune, "_PROBE_CACHE", None)
    monkeypatch.setattr(autotune, "_expected_backend", lambda: "tpu")
    with open(path, "w") as f:
        json.dump({"links": {"tpu": {"h2d_mbps": 100.0, "d2h_mbps": 50.0,
                                     "rtt_s": 0.052,
                                     "ts": _time.time()}}}, f)
    got = autotune.probe_link_bandwidth()
    assert got["rtt_s"] == 0.052
    # legacy entry without rtt_s
    monkeypatch.setattr(autotune, "_PROBE_CACHE", None)
    with open(path, "w") as f:
        json.dump({"links": {"tpu": {"h2d_mbps": 100.0, "d2h_mbps": 50.0,
                                     "ts": _time.time()}}}, f)
    got = autotune.probe_link_bandwidth()
    assert "rtt_s" not in got and got["h2d_mbps"] == 100.0
