#!/usr/bin/env python3
"""Environment diagnosis: the first-hardware-contact checklist, automated.

``stitcher-doctor`` reports, without ever hanging on a stalled remote
runtime (every jax touch goes through the killable probe subprocess):

- which jax backend a run would use, and whether it initializes at all
- measured host<->device link bandwidth and the fusion placement the
  engine would choose from it
- the host's measured in-RAM placement rate
- native C kernel availability (and which symbols are bound)
- disk write throughput where outputs would land
- persistent compile-cache and probe-cache state

Reference context: the reference has no diagnostics at all (prints
only); deployment triage there means reading tracebacks. This replaces
docs/DEPLOYMENT.md's manual checklist items 1-4 with one command.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from typing import List, Tuple


def _check_backend(deadline: float) -> Tuple[str, List[str]]:
    from ..parallel.autotune import _expected_backend, _run_probe
    lines = []
    expected = _expected_backend()
    lines.append(f"expected backend: {expected or 'unknown until init'}")
    t0 = time.perf_counter()
    probed = _run_probe(16, deadline)
    dt = time.perf_counter() - t0
    if probed is None:
        lines.append(f"device probe: STALLED/FAILED after {dt:.0f}s — the "
                     "runtime did not answer (dead tunnel or missing "
                     "plugin). The engine will run all-host.")
        return 'dead', lines
    backend, rates = probed
    lines.append(f"device probe: backend={backend} "
                 f"h2d={rates['h2d_mbps']:.0f} MiB/s "
                 f"d2h={rates['d2h_mbps']:.1f} MiB/s ({dt:.1f}s)")
    return backend, lines


def _check_placement(link_dead: bool) -> List[str]:
    from ..parallel.autotune import (choose_fusion_backend, DEAD_LINK,
                                     probe_host_bandwidth,
                                     probe_link_bandwidth)
    lines = []
    host_bps = probe_host_bandwidth()
    lines.append(f"host placement rate: {host_bps / 1e9:.2f} GB/s")
    link = DEAD_LINK if link_dead else probe_link_bandwidth()
    # a representative job: 10x10x3ch 2048^2 uint16
    tiles = 300 * 2048 * 2048 * 2
    canvas = 3 * 18635 * 18635 * 2
    choice = choose_fusion_backend(canvas, tiles, link, host_bps=host_bps)
    lines.append(f"fusion placement for a 10x10x3ch 2048^2 job: {choice}")
    return lines


def _check_native() -> List[str]:
    from ..native import get_lib
    lib = get_lib()
    if lib is None:
        return ["native kernels: UNAVAILABLE (no C compiler?) — host "
                "fusion falls back to NumPy, raw writes to tensorstore"]
    syms = [s for s in ('place_u16', 'feather_u16', 'write_rows_contig',
                        'downsample2x_u16', 'downsample2x2_mean_u16')
            if hasattr(lib, s)]
    return [f"native kernels: OK ({', '.join(syms)})"]


def _check_disk(path: str, size_mb: int = 256) -> List[str]:
    buf = os.urandom(1 << 20)
    fd, tmp = tempfile.mkstemp(dir=path, prefix='.doctor_disk_')
    try:
        t0 = time.perf_counter()
        for _ in range(size_mb):
            os.write(fd, buf)
        os.fsync(fd)
        dt = time.perf_counter() - t0
    finally:
        os.close(fd)
        os.unlink(tmp)
    return [f"disk write ({path}): {size_mb / dt:.0f} MB/s "
            f"({size_mb} MB, fsync'd)"]


def _check_caches() -> List[str]:
    from ..parallel.autotune import _probe_cache_path
    lines = []
    p = _probe_cache_path()
    try:
        with open(p) as f:
            saved = json.load(f)
        links = ', '.join(
            f"{k}: h2d={v['h2d_mbps']:.0f}/d2h={v['d2h_mbps']:.1f} MiB/s"
            for k, v in saved.get('links', {}).items())
        lines.append(f"probe cache: {links or 'empty'} ({p})")
    except Exception:
        lines.append(f"probe cache: none ({p})")
    cc = os.environ.get('JAX_COMPILATION_CACHE_DIR') or os.path.expanduser(
        '~/.cache/jax')
    n = 0
    for _root, _dirs, files in os.walk(cc):
        n += len(files)
    lines.append(f"jax compile cache: {n} file(s) under {cc}")
    return lines


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Diagnose the stitching environment (storm-safe)")
    ap.add_argument("--output-dir", default=tempfile.gettempdir(),
                    help="directory whose disk to probe (default: tmp)")
    ap.add_argument("--deadline", type=float, default=60.0,
                    help="device probe kill deadline, seconds")
    ap.add_argument("--skip-device", action="store_true",
                    help="skip the device probe entirely")
    args = ap.parse_args(argv)

    sections = []
    if args.skip_device:
        backend = 'skipped'
        sections.append(("Device", ["device probe: skipped"]))
    else:
        backend, lines = _check_backend(args.deadline)
        sections.append(("Device", lines))
    sections.append(("Placement",
                     _check_placement(link_dead=backend == 'dead')))
    sections.append(("Native", _check_native()))
    try:
        sections.append(("Disk", _check_disk(args.output_dir)))
    except OSError as e:
        sections.append(("Disk", [f"disk probe failed: {e}"]))
    sections.append(("Caches", _check_caches()))

    for title, lines in sections:
        print(f"[{title}]")
        for line in lines:
            print(f"  {line}")
    return 0


if __name__ == '__main__':
    sys.exit(main())
