#!/usr/bin/env python3
"""Throughput bench for the remaining BASELINE.md eval configs.

BASELINE.md's eval list names two shapes the north-star g10 bench
doesn't time: the Z=20 TCZYX multiscale stack and a 96-well HCS
multi-region/timepoint run with streamed merges (reference merge path:
/root/reference/stitcher.py:900-1218). Both have correctness tests
(tests/test_scale_configs.py); this tool records their wall time and
per-stage decomposition so the merge stage is provably not a hidden
wall at plate scale (VERDICT r4 #5).

    python -m image_stitcher_tpu.tools.config_bench [--reps N]
    python -m image_stitcher_tpu.tools.config_bench --config z20

Prints one JSON list on stdout; progress/diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _fixtures():
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo_root, 'tests'))
    from fixtures import write_synthetic_acquisition
    return write_synthetic_acquisition


def _run(params, options):
    from ..models.pipeline import StitchPipeline
    pipe = StitchPipeline(params, options)
    t0 = time.perf_counter()
    pipe.run()
    return time.perf_counter() - t0, pipe


def bench_z20(workdir: str, reps: int):
    """Z=20 TCZYX multiscale: 3x3 grid of 1024^2 single-channel tiles
    at 20 z-levels (180 tiles, ~360 MB raw) -> registered multiscale
    OME-Zarr."""
    from .. import EngineOptions, StitchingParameters
    write = _fixtures()
    acq = os.path.join(workdir, "z20")
    _log("building z20 fixture (3x3 x 20z 1024^2)...")
    write(acq, grid_cols=3, grid_rows=3, tile_w=1024, tile_h=1024,
          overlap=104, num_z=20, jitter=2, seed=5)
    n_tiles = 3 * 3 * 20
    best, stages = None, None
    for rep in range(reps):
        dt, pipe = _run(
            StitchingParameters(input_folder=acq, use_registration=True),
            EngineOptions(compressor_cname='auto'))
        _log(f"z20[{rep}]: {dt:.1f}s = {n_tiles / dt:.1f} tiles/s")
        if best is None or dt < best:
            best, stages = dt, pipe.timers.as_dict()
        for d in glob.glob(acq + "_stitched_*"):
            shutil.rmtree(d, ignore_errors=True)
    return {"config": "z20-tczyx-multiscale (3x3 x20z 1024^2)",
            "seconds": round(best, 2),
            "tiles_per_s": round(n_tiles / best, 2),
            "stages": {k: round(v, 2) for k, v in sorted(
                stages.items(), key=lambda kv: -kv[1])}}


def bench_hcs96(workdir: str, reps: int):
    """96-well HCS plate: every well A1..H12 a 1x1 FOV of 512^2, two
    timepoints, coordinate stitch + per-timepoint HCS plate merge +
    complete (timepoint) merge — the streamed merge tree."""
    from .. import EngineOptions, StitchingParameters
    write = _fixtures()
    acq = os.path.join(workdir, "hcs96")
    regions = [f"{r}{c}" for r in "ABCDEFGH" for c in range(1, 13)]
    _log("building 96-well fixture (1x1 512^2 x 2t)...")
    write(acq, grid_cols=1, grid_rows=1, tile_w=512, tile_h=512,
          overlap=0, regions=regions, timepoints=2, seed=6)
    n_tiles = 96 * 2
    best, stages = None, None
    for rep in range(reps):
        dt, pipe = _run(
            StitchingParameters(input_folder=acq, merge_timepoints=True,
                                merge_hcs_regions=True),
            EngineOptions(compressor_cname='auto'))
        _log(f"hcs96[{rep}]: {dt:.1f}s = {n_tiles / dt:.1f} tiles/s "
             f"(merge {pipe.timers.as_dict().get('merge', 0.0):.1f}s)")
        if best is None or dt < best:
            best, stages = dt, pipe.timers.as_dict()
        for d in glob.glob(acq + "_stitched_*"):
            shutil.rmtree(d, ignore_errors=True)
    return {"config": "hcs-96well x2t streamed merges (512^2 wells)",
            "seconds": round(best, 2),
            "tiles_per_s": round(n_tiles / best, 2),
            "merge_seconds": round(stages.get('merge', 0.0), 2),
            "stages": {k: round(v, 2) for k, v in sorted(
                stages.items(), key=lambda kv: -kv[1])}}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--config", choices=["z20", "hcs96", "all"],
                   default="all")
    args = p.parse_args(argv)
    workdir = tempfile.mkdtemp(prefix="config_bench_")
    results = []
    try:
        if args.config in ("z20", "all"):
            results.append(bench_z20(workdir, args.reps))
        if args.config in ("hcs96", "all"):
            results.append(bench_hcs96(workdir, args.reps))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(results))
    return 0


if __name__ == '__main__':
    sys.exit(main())
