"""Weather-gated official-style bench capture.

The 1-core host's allocation swings 3-8x within minutes (see
BENCH_NOTES methodology): a capture in a starved window wastes its
whole time budget recording weather. This tool measures the core share
a busy thread actually gets (thread_time/wall over a short spin); only
when the host is near full-core does it launch `python bench.py` and
append the resulting JSON line to CAPTURES_r4.log. Run from cron:

    python tools/weather_capture.py [--force]

Exit codes: 0 = capture ran, 3 = skipped (bad weather), >0 = error.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "CAPTURES_r4.log")
THRESHOLD = float(os.environ.get("WEATHER_MIN_SHARE", "0.85"))


def core_share(seconds: float = 2.0) -> float:
    """Fraction of one core a busy thread gets right now."""
    t0w, t0c = time.perf_counter(), time.thread_time()
    x = 1.0
    while time.perf_counter() - t0w < seconds:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
    return (time.thread_time() - t0c) / (time.perf_counter() - t0w)


def main() -> int:
    share = core_share()
    try:
        load1 = open("/proc/loadavg").read().split()[0]
    except OSError:
        load1 = "?"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())
    head = (f"{stamp} share={share:.2f} load1={load1}")
    if share < THRESHOLD and "--force" not in sys.argv:
        with open(LOG, "a") as f:
            f.write(head + " SKIP (starved window)\n")
        print(head, "-> skip")
        return 3
    env = dict(os.environ)
    env.setdefault("BENCH_REPEATS", "8")
    env.setdefault("BENCH_TIME_BUDGET", "480")
    t0 = time.perf_counter()
    proc = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)
    dt = time.perf_counter() - t0
    result = ""
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            result = line
            break
    with open(LOG, "a") as f:
        f.write(f"{head} CAPTURE ({dt:.0f}s, rc={proc.returncode}): "
                f"{result or '(no JSON line)'}\n")
    print(head, "->", result or f"rc={proc.returncode}")
    if result:
        try:
            vs = json.loads(result).get("vs_baseline", 0)
            print(f"vs_baseline {vs}")
        except json.JSONDecodeError:
            pass
    return 0 if proc.returncode == 0 else proc.returncode


if __name__ == "__main__":
    sys.exit(main())
