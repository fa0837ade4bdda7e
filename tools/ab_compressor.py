"""Interleaved compressor A/B on COMPRESSIBLE bench content.

The bench's default fixture is full-entropy texture, so the
compressor-'auto' probe always stores raw chunks and the blosc-lz4 arm
never runs end-to-end (VERDICT r3 #8). This tool builds the
BENCH_CONTENT=compressible fixture (6 low bits zeroed — entropy like
real microscopy) and interleaves two arms on it:

  auto : compressor_cname='auto'  (probe should pick blosc-lz4-5)
  raw  : compressor_cname=None    (store raw chunks, O_DIRECT path)

Weather methodology applies (interleaved best-of in one window only).
Run:  python tools/ab_compressor.py [reps]
"""
import glob
import os
import shutil
import sys
import time

os.environ.setdefault("BENCH_CONTENT", "compressible")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def out_bytes(acq: str) -> int:
    total = 0
    for d in glob.glob(acq + "_stitched_*"):
        for r, _, fs in os.walk(d):
            for f in fs:
                try:
                    total += os.path.getsize(os.path.join(r, f))
                except OSError:
                    pass
    return total


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import bench
    acq = bench.cached_acquisition()
    bench.prewarm(acq)
    from image_stitcher_tpu import EngineOptions, StitchingParameters
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu.utils.progress import ProgressReporter

    chosen = {}

    def run(name: str, cname) -> float:
        params = StitchingParameters(input_folder=acq,
                                     use_registration=True,
                                     apply_flatfield=True)
        opts = EngineOptions(fusion_device='host', flatfield_device='host',
                             compressor_cname=cname)
        pipe = StitchPipeline(params, opts, reporter=ProgressReporter())
        t0 = time.perf_counter()
        pipe.run()
        dt = time.perf_counter() - t0
        if name not in chosen:
            chosen[name] = (pipe.resolved_compressor(), out_bytes(acq))
        for d in glob.glob(acq + "_stitched_*"):
            shutil.rmtree(d, ignore_errors=True)
        return dt

    arms = (("auto", "auto"), ("raw", None))
    run("warmup", None)  # page-in + native lib + probe caches
    chosen.clear()
    best = {}
    for rep in range(reps):
        for name, cname in arms:
            dt = run(name, cname)
            best[name] = min(best.get(name, dt), dt)
            print(f"rep{rep} {name:5s}: {dt:.2f}s  (best {best[name]:.2f})",
                  flush=True)
    for name, (comp, nbytes) in sorted(chosen.items()):
        print(f"{name:5s}: compressor={comp} output={nbytes / 1e9:.2f} GB")
    if len(best) == 2:
        print(f"RESULT best auto={best['auto']:.2f}s raw={best['raw']:.2f}s "
              f"(raw/auto {best['raw'] / best['auto']:.3f}x)")


if __name__ == "__main__":
    main()
