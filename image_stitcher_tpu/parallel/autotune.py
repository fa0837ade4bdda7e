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

HOST_FUSE_BYTES_PER_S = 1.2e9   # conservative in-RAM assembly rate


_PROBE_FILE = None  # resolved lazily; patchable in tests
_PROBE_TTL_S = 24 * 3600


def _probe_cache_path() -> str:
    import os
    return os.path.expanduser("~/.cache/image_stitcher_tpu/linkprobe.json")


def probe_link_bandwidth(size_mb: int = 16, force: bool = False) -> Dict[str, float]:
    """Measure H2D and D2H throughput (MB/s) with pure transfers.

    No device computation is involved — on remote backends a single
    stray jit can cost minutes of compile. The result is cached
    in-process and on disk (per boot day) since link bandwidth is a
    property of the machine, not the run.
    """
    global _PROBE_CACHE
    if _PROBE_CACHE is not None and not force:
        return _PROBE_CACHE

    import json
    import os

    import jax
    backend = jax.default_backend()
    path = _PROBE_FILE or _probe_cache_path()
    if not force:
        try:
            with open(path) as f:
                saved = json.load(f)
            # bandwidth is a property of (machine, backend): a CPU-run
            # probe must never drive a TPU run's placement decision
            if (saved.get('backend') == backend
                    and time.time() - saved.get('ts', 0) < _PROBE_TTL_S):
                _PROBE_CACHE = {'h2d_mbps': saved['h2d_mbps'],
                                'd2h_mbps': saved['d2h_mbps']}
                return _PROBE_CACHE
        except Exception:
            pass
    n = size_mb * 1024 * 1024 // 2
    rng = np.random.default_rng(0)
    host_a = rng.integers(0, 60000, (n,), dtype=np.uint16)
    host_b = rng.integers(0, 60000, (n,), dtype=np.uint16)
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

    _PROBE_CACHE = {'h2d_mbps': h2d, 'd2h_mbps': d2h}
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            json.dump({**_PROBE_CACHE, 'ts': time.time(),
                       'backend': backend}, f)
    except Exception:
        pass
    return _PROBE_CACHE


def choose_fusion_backend(canvas_bytes: int, tiles_bytes: int,
                          probe: Optional[Dict[str, float]] = None) -> str:
    """'device' or 'host', by modeled wall time.

    device path moves all tile bytes H2D and the canvas D2H (for writing);
    host path moves tile bytes through RAM twice (read + place).
    """
    probe = probe or probe_link_bandwidth()
    # the probe reports MiB/s (it divides size_mb MiB by seconds)
    mib = 1024 * 1024
    device_s = (tiles_bytes / (probe['h2d_mbps'] * mib)
                + canvas_bytes / (probe['d2h_mbps'] * mib))
    host_s = 2 * tiles_bytes / HOST_FUSE_BYTES_PER_S
    return 'device' if device_s < host_s else 'host'
