"""Run N instrumented bench-shape reps and print the stage/CPU split.

Reuses bench.py's fixture, prewarm, and run_ours (same stage stats the
official capture logs, including the per-stage on-core CPU line), but
skips the baseline and probes — the fast way to decompose the e2e CPU
floor after a change. Usage:

    python tools/profile_rep.py [reps]
"""
import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import bench  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    acq_dir = bench.cached_acquisition()
    bench.prewarm(acq_dir)
    best = None
    try:
        for i in range(reps):
            dt, _pipe = bench.run_ours(acq_dir)
            bench.log(f"rep[{i}]: {dt:.2f}s")
            best = dt if best is None else min(best, dt)
            for d in glob.glob(acq_dir + "_stitched_*"):
                shutil.rmtree(d, ignore_errors=True)
        bench.log(f"best of {reps}: {best:.2f}s = "
                  f"{bench.GRID * bench.GRID * len(bench.CHANNELS) / best:.2f}"
                  f" tiles/s")
    finally:
        for d in glob.glob(acq_dir + "_stitched_*"):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
