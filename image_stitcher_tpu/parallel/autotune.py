"""Link-bandwidth probe and fusion-backend selection.

Fusion is data movement; where it should run depends on how fast bytes
move host<->device. A DMA-attached TPU (PCIe: ~10+ GB/s both ways) makes
device fusion strictly better; a tunneled remote device (tens of MB/s
device->host) makes host fusion the only sane choice. One tiny measured
probe decides — the stitching analogue of kernel autotuning.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

_PROBE_CACHE: Optional[Dict[str, float]] = None
_HOST_PROBE_CACHE: Optional[float] = None

HOST_FUSE_BYTES_PER_S = 1.2e9   # fallback if the host probe fails


_PROBE_FILE = None  # resolved lazily; patchable in tests
_PROBE_TTL_S = 24 * 3600


def _probe_cache_path() -> str:
    import os
    return os.path.expanduser("~/.cache/image_stitcher_tpu/linkprobe.json")


#: a stalled remote runtime (tunnel storms) blocks jax initialization
#: indefinitely; the probe must never hang the all-host pipeline with it
_PROBE_DEADLINE_S = 30.0

#: what a dead/stalled link probes as — forces the host backend
#: (rtt = the probe deadline: a dispatch through a dead link costs at
#: least the time it took to declare the link dead)
DEAD_LINK = {'h2d_mbps': 1e-3, 'd2h_mbps': 1e-3, 'rtt_s': 30.0}


def _canonical(name):
    """Canonical platform name (plugin aliases like 'axon' map to
    'tpu'). Importing jax does NOT initialize backends — verified: the
    alias table is consulted without touching any runtime — so this is
    safe under a stalled tunnel. Cache keys MUST be canonical: probes
    record ``jax.default_backend()`` (canonical), so an alias-keyed
    lookup would never hit."""
    if not name:
        return None
    try:
        from jax._src import xla_bridge
        return xla_bridge.canonicalize_platform(name)
    except Exception:
        return name


def _live_backend():
    """Canonical name of an ALREADY-initialized backend, else None.
    Never initializes anything."""
    import sys
    mod = sys.modules.get('jax')
    if mod is not None:
        try:
            from jax._src import xla_bridge
            if getattr(xla_bridge, '_backends', None):
                return mod.default_backend()   # already live: cheap
        except Exception:
            pass
    return None


def _env_platforms() -> str:
    import os
    return os.environ.get('JAX_PLATFORMS', '').strip()


def _expected_backend():
    """The canonical backend name this process WOULD use, without
    initializing it. Initializing a stalled remote runtime just to
    learn its name can hang forever; a fresh cache entry for the
    expected backend must be usable with zero jax contact. Returns
    None when unknowable (env-less, jax not yet live)."""
    live = _live_backend()
    if live:
        return live
    env = _env_platforms()
    if env:
        # first entry of the priority list — a fallback-initialized
        # parent may actually run a later entry; that only costs a
        # cache miss, and the probe child gets the FULL list
        return _canonical(env.split(',')[0].strip().lower() or None)
    return None


def _probe_transfers(size_mb: int):
    """The jax-touching part: init + two pure transfers. Runs inside
    the ``_run_probe`` subprocess (killable; see its docstring for why
    not a thread)."""
    import jax
    n = size_mb * 1024 * 1024 // 2
    rng = np.random.default_rng(0)
    host_a = rng.integers(0, 60000, (n,), dtype=np.uint16)
    host_b = rng.integers(0, 60000, (n,), dtype=np.uint16)
    backend = jax.default_backend()
    # warm the dispatch path
    jax.device_put(host_a[:128]).block_until_ready()

    t0 = time.perf_counter()
    dev_a = jax.device_put(host_a)
    dev_a.block_until_ready()
    h2d = size_mb / max(time.perf_counter() - t0, 1e-9)

    # a second, unread buffer: jax has no cached host value for it, so
    # np.asarray performs a genuine device->host transfer (no compute)
    dev_b = jax.device_put(host_b)
    dev_b.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(dev_b)
    d2h = size_mb / max(time.perf_counter() - t0, 1e-9)

    # dispatch round-trip: tiny jit + data-dependent SCALAR readback.
    # block_until_ready alone has been observed returning early through
    # remote runtimes (r5 probe: it timed a 4096^2 matmul at 7000
    # "TFLOP/s"); only a value readback proves the chip executed. This
    # is the per-dispatch latency floor every device stage pays when it
    # synchronizes — 0.1 ms DMA-attached, ~52 ms through the r5 tunnel.
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    x = jax.device_put(np.zeros((8, 8), np.float32))
    float(jnp.sum(f(x)))  # compile + warm the readback path
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    return backend, {'h2d_mbps': h2d, 'd2h_mbps': d2h, 'rtt_s': rtt}


def _run_probe(size_mb: int, deadline_s: float, platform=None):
    """Run ``_probe_transfers`` in a SUBPROCESS under a hard kill
    deadline. Returns (backend, rates) or None on timeout/failure.

    A subprocess, not a thread: a stalled remote runtime blocks jax
    initialization itself (the axon-style plugins initialize their
    client even when another platform is selected), and a thread stuck
    inside that init can't be killed — it leaks and aborts the
    interpreter at exit (observed). A healthy-link probe costs one
    interpreter+jax startup per disk-cache TTL; accepting that beats
    any in-process fast path that can hang the pipeline.

    ``platform`` pins the child via the config API (the env var is
    overridden by such plugins) and may be a comma-separated priority
    list, so a parent that would fall back (e.g. 'tpu,cpu') probes the
    same fallback chain. Pass only user intent (env) or a live parent
    backend — never a cached guess, which could pin the child to a
    platform that no longer exists and lock every future probe into
    failure.

    Timeouts AND child errors both return None (the caller treats the
    link as dead), but child errors are logged with stderr so a
    persistent misconfiguration is visible instead of silently forcing
    host fusion forever.
    """
    import json as _json
    import os
    import subprocess
    import sys
    # the child must import image_stitcher_tpu from wherever the
    # parent did (source checkouts without install); sys.path injection
    # — NOT PYTHONPATH, which breaks plugin entry-point registration
    pkg_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    code = (
        "import json, sys\n"
        "sys.path.insert(0, sys.argv[3])\n"
        "if sys.argv[2] != 'none':\n"
        "    import jax\n"
        "    jax.config.update('jax_platforms', sys.argv[2])\n"
        "from image_stitcher_tpu.parallel.autotune import _probe_transfers\n"
        "b, r = _probe_transfers(int(sys.argv[1]))\n"
        "print('PROBE_JSON ' + json.dumps([b, r]), flush=True)\n")
    try:
        out = subprocess.run(
            [sys.executable, '-c', code, str(size_mb), platform or 'none',
             pkg_root],
            capture_output=True, timeout=deadline_s, text=True)
    except subprocess.TimeoutExpired:
        return None
    except Exception as e:
        _log_probe_failure(f"probe subprocess failed to launch: {e!r}")
        return None
    for line in out.stdout.splitlines():
        if line.startswith('PROBE_JSON '):
            try:
                backend, rates = _json.loads(line[len('PROBE_JSON '):])
                return backend, rates
            except Exception:
                break
    _log_probe_failure(
        f"probe child rc={out.returncode}; stderr tail: "
        f"{out.stderr.strip()[-400:]!r}")
    return None


def _log_probe_failure(msg: str) -> None:
    import logging
    logging.getLogger('image_stitcher_tpu.autotune').warning(
        "link probe failed (treating link as dead -> host fusion): %s",
        msg)


def probe_link_bandwidth(size_mb: int = 16, force: bool = False) -> Dict[str, float]:
    """Measure H2D and D2H throughput (MB/s) with pure transfers.

    No device computation is involved — on remote backends a single
    stray jit can cost minutes of compile. Results are cached in-process
    and on disk per backend (link bandwidth is a property of the
    machine+backend, not the run); a fresh disk entry is served WITHOUT
    touching jax, and a cache-miss probe runs under a deadline — a
    stalled tunnel yields DEAD_LINK (host fusion) instead of hanging
    the pipeline inside backend initialization.
    """
    global _PROBE_CACHE
    if _PROBE_CACHE is not None and not force:
        return _PROBE_CACHE

    import json
    import os

    path = _PROBE_FILE or _probe_cache_path()
    expected = _expected_backend()
    if not force:
        try:
            saved = _load_cache_file(path)
            lookup = expected
            if lookup is None:
                # env-less: what a default init resolved to on this
                # machine last time (a machine property, recorded
                # below). A cache-lookup hint ONLY — never a probe pin,
                # so a stale name costs a re-probe, not a lockout.
                lookup = saved.get('default_backend')
            # per-backend sections: a CPU-run probe must never drive a
            # TPU run's placement decision (and vice versa)
            entry = saved.get('links', {}).get(lookup)
            if (entry
                    and time.time() - entry.get('ts', 0) < _PROBE_TTL_S):
                _PROBE_CACHE = {'h2d_mbps': entry['h2d_mbps'],
                                'd2h_mbps': entry['d2h_mbps']}
                if 'rtt_s' in entry:  # absent in pre-r5 cache files
                    _PROBE_CACHE['rtt_s'] = entry['rtt_s']
                return _PROBE_CACHE
        except Exception:
            pass

    # pin the child only from user intent (full env priority list) or
    # a live parent backend — a cached guess could pin it to a platform
    # that no longer exists and lock every future probe into failure
    pin = _live_backend() or _env_platforms() or None
    probed = _run_probe(size_mb, _PROBE_DEADLINE_S, pin)
    if probed is None:
        # stalled or failed: treat the link as dead for this run, but
        # do NOT poison the disk cache with a transient storm
        _PROBE_CACHE = dict(DEAD_LINK)
        return _PROBE_CACHE

    backend, rates = probed
    _PROBE_CACHE = rates
    try:
        try:
            saved = _load_cache_file(path)
        except Exception:
            saved = {}
        saved.setdefault('links', {})[backend] = {
            **rates, 'ts': time.time()}
        if not _env_platforms():
            saved['default_backend'] = backend
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            json.dump(saved, f)
    except Exception:
        pass
    return _PROBE_CACHE


def _load_cache_file(path: str) -> Dict:
    """Read the probe cache, migrating the legacy flat layout
    ({'h2d_mbps', 'd2h_mbps', 'ts', 'backend', 'host_bps', ...}) into
    the per-backend 'links' layout; stale flat keys are dropped on the
    next rewrite because only the migrated dict is ever re-saved."""
    import json
    with open(path) as f:
        saved = json.load(f)
    if 'links' not in saved and 'h2d_mbps' in saved:
        migrated: Dict = {'links': {}}
        backend = _canonical(saved.get('backend'))
        if backend:
            migrated['links'][backend] = {
                'h2d_mbps': saved['h2d_mbps'],
                'd2h_mbps': saved['d2h_mbps'],
                'ts': saved.get('ts', 0)}
        for key in ('host_bps', 'host_ts'):
            if key in saved:
                migrated[key] = saved[key]
        return migrated
    return saved


def probe_host_bandwidth(size_mb: int = 16, force: bool = False) -> float:
    """Measure the host's in-RAM tile-placement rate (bytes/s).

    One shot: place uint16 blocks into a larger canvas through a f32
    flatfield multiply — the actual work host fusion does per byte.
    Measured, not assumed: a fast many-core host places at several GB/s
    while a throttled shared core manages a few hundred MB/s, and the
    backend choice flips on that difference. Cached in-process and in
    the same on-disk file as the link probe (host rate is a machine
    property, subject to the same TTL).
    """
    global _HOST_PROBE_CACHE
    if _HOST_PROBE_CACHE is not None and not force:
        return _HOST_PROBE_CACHE

    import json
    import os
    path = _PROBE_FILE or _probe_cache_path()
    if not force:
        try:
            saved = _load_cache_file(path)
            if (saved.get('host_bps')
                    and time.time() - saved.get('host_ts', 0) < _PROBE_TTL_S):
                _HOST_PROBE_CACHE = float(saved['host_bps'])
                return _HOST_PROBE_CACHE
        except Exception:
            pass

    n_bytes = size_mb * 1024 * 1024
    tile_h = tile_w = 1024
    tile_bytes = tile_h * tile_w * 2
    n_tiles = max(1, n_bytes // tile_bytes)
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 60000, (n_tiles, tile_h, tile_w),
                         dtype=np.uint16)
    recip = np.float32(1.0) / (1.0 + rng.random(
        (tile_h, tile_w), dtype=np.float32))
    canvas = np.zeros((tile_h * 2, tile_w * ((n_tiles + 1) // 2)),
                      dtype=np.uint16)
    t0 = time.perf_counter()
    for i in range(n_tiles):
        r, c = (i % 2) * tile_h, (i // 2) * tile_w
        corrected = (tiles[i] * recip).clip(0, 65535).astype(np.uint16)
        canvas[r:r + tile_h, c:c + tile_w] = corrected
    elapsed = max(time.perf_counter() - t0, 1e-9)
    rate = n_tiles * tile_bytes / elapsed
    _HOST_PROBE_CACHE = rate
    try:
        try:
            saved = _load_cache_file(path)
        except Exception:
            saved = {}
        saved.update({'host_bps': rate, 'host_ts': time.time()})
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            json.dump(saved, f)
    except Exception:
        pass
    return rate


def choose_fusion_backend(canvas_bytes: int, tiles_bytes: int,
                          probe: Optional[Dict[str, float]] = None,
                          host_bps: Optional[float] = None) -> str:
    """'device' or 'host', by modeled wall time from two MEASURED rates.

    device path moves all tile bytes H2D and the canvas D2H (for writing);
    host path moves tile bytes through RAM twice (read + place) at the
    rate the host probe actually measured on this machine.
    """
    probe = probe or probe_link_bandwidth()
    if host_bps is None:
        try:
            host_bps = probe_host_bandwidth()
        except Exception:
            host_bps = HOST_FUSE_BYTES_PER_S
    # the probe reports MiB/s (it divides size_mb MiB by seconds)
    mib = 1024 * 1024
    device_s = (tiles_bytes / (probe['h2d_mbps'] * mib)
                + canvas_bytes / (probe['d2h_mbps'] * mib))
    host_s = 2 * tiles_bytes / host_bps
    return 'device' if device_s < host_s else 'host'


# ------------------------------------------------- dispatch crossover model
#
# Measured constants behind the model (r5 live window, PROBE_LOG_r5.md):
# tunnel rtt ~52 ms/dispatch-sync, chip healthy underneath it (74 TFLOP/s
# once chained); DMA-attached rtt is ~0.1 ms. The same pallas placement
# kernel measured 4416 tiles/s at 10-tile dispatches and 7143 tiles/s at
# 50-tile dispatches on the SAME link — per-dispatch latency, not the
# kernel, is what a sick link taxes. Hence: fewer, bigger dispatches.

def min_work_per_dispatch_s(rtt_s: float, device_speedup: float) -> float:
    """Host-work seconds one dispatch must carry before the device wins.

    A stage doing W s of host work per dispatch runs in W/S + rtt on
    the device (S = device compute speedup); it beats the host iff
    W > rtt * S / (S - 1). Through the r5 tunnel (rtt 52 ms, S ~ 10-50x)
    that is ~55-58 ms of host work PER DISPATCH — the g10 center-pair
    registration (0.28 s total, 2 dispatches) clears it only 2-3x,
    which transfer time then erases; DMA-attached (rtt 0.1 ms) anything
    over ~0.1 ms/dispatch wins. This is the model that decides
    'host-only was optimal' for tunnel deployments (VERDICT r4 #1).
    """
    if device_speedup <= 1.0:
        return float('inf')
    return rtt_s * device_speedup / (device_speedup - 1.0)


def device_stage_wall_s(bytes_in: int, bytes_out: int, n_dispatches: int,
                        device_compute_s: float,
                        probe: Optional[Dict[str, float]] = None) -> float:
    """Modeled wall time of a device stage through the CURRENT link:
    transfers at probed bandwidth + one rtt per synchronizing dispatch
    + on-chip compute. Compare against the host twin's measured time to
    decide placement; bench.py's stage probes measure instead of model,
    this is for planning shapes too big to probe."""
    probe = probe or probe_link_bandwidth()
    mib = 1024 * 1024
    rtt = probe.get('rtt_s', 0.0)
    return (bytes_in / (probe['h2d_mbps'] * mib)
            + bytes_out / (probe['d2h_mbps'] * mib)
            + n_dispatches * rtt + device_compute_s)
