"""TPU link watch: probe the tunnel, log, and pounce on a live window.

The axon tunnel has been dead for most of round 4 (PROBE_LOG_r4.md).
A stalled tunnel blocks jax *initialization* itself, so this parent
imports NOTHING jax-adjacent: every probe/validation/capture step runs
in a subprocess under a hard timeout (see
image_stitcher_tpu/parallel/autotune.py:_run_probe for the rationale).

One invocation = one watch step:
  1. force a fresh link-bandwidth probe (subprocess, 240 s deadline),
     append the result to PROBE_LOG_r4.md;
  2. if BOTH directions clear 50 MB/s: run the on-chip validations
     (tpu_kernel_check, tpu_e2e_check), leave the probe cache fresh so
     bench reps pick device stages, then run a weather-gated capture
     (tools/weather_capture.py --force) so the live window lands in
     CAPTURES_r4.log.

Run from cron every ~23 min. Exit 0 always (a dead link is a normal
observation, not an error); the log is the deliverable.
"""
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_LOG = os.path.join(REPO, "PROBE_LOG_r4.md")
# probe_link_bandwidth reports MB/s (h2d_mbps/d2h_mbps)
LIVE_MBS = 50.0

PROBE_CODE = """
import json, sys
sys.path.insert(0, %r)
from image_stitcher_tpu.parallel.autotune import probe_link_bandwidth
r = probe_link_bandwidth(size_mb=16, force=True)
print('WATCH_JSON ' + json.dumps(r), flush=True)
""" % (REPO,)


def log(line: str) -> None:
    with open(PROBE_LOG, "a") as f:
        f.write(line.rstrip() + "\n")
    print(line)


def now() -> str:
    return datetime.datetime.now(datetime.timezone.utc
                                 ).strftime("%Y-%m-%d %H:%M:%S")


def probe():
    """Fresh link probe in a subprocess.

    Returns (rates dict, None) on success, (None, reason) otherwise —
    a killed-at-deadline child and a crashed child are DIFFERENT
    observations (the latter means the watch itself is broken, not the
    tunnel) and must be logged distinguishably."""
    try:
        out = subprocess.run([sys.executable, "-c", PROBE_CODE],
                             capture_output=True, timeout=240, text=True)
    except subprocess.TimeoutExpired:
        return None, "probe child killed at 240s deadline — link DEAD"
    for line in out.stdout.splitlines():
        if line.startswith("WATCH_JSON "):
            try:
                return json.loads(line[len("WATCH_JSON "):]), None
            except Exception:
                break
    return None, (f"PROBE CHILD BROKEN (rc={out.returncode}) — fix the "
                  f"watch, this says nothing about the link; stderr: "
                  f"{out.stderr.strip()[-200:]!r}")


def run_step(argv, timeout_s, label):
    """Run a validation/capture step; returns (rc, tail-of-output)."""
    try:
        out = subprocess.run(argv, capture_output=True, timeout=timeout_s,
                             text=True, cwd=REPO)
        tail = (out.stdout + out.stderr).strip()[-300:]
        return out.returncode, tail
    except subprocess.TimeoutExpired:
        return -1, f"{label} killed at {timeout_s}s deadline"


def main() -> int:
    rates, reason = probe()
    if rates is None:
        log(f"| {now()} | - | - | {reason} |")
        return 0
    h2d = float(rates.get("h2d_mbps", rates.get("h2d", 0.0)) or 0.0)
    d2h = float(rates.get("d2h_mbps", rates.get("d2h", 0.0)) or 0.0)
    if h2d < LIVE_MBS or d2h < LIVE_MBS:
        log(f"| {now()} | {h2d:.1f} | {d2h:.1f} | below {LIVE_MBS:.0f} "
            f"MB/s gate — device stages unusable |")
        return 0
    log(f"| {now()} | {h2d:.1f} | {d2h:.1f} | LIVE — validating on-chip |")
    ok = True
    for mod, budget in (("image_stitcher_tpu.tools.tpu_kernel_check", 900),
                        ("image_stitcher_tpu.tools.tpu_e2e_check", 900)):
        rc, tail = run_step([sys.executable, "-m", mod], budget, mod)
        log(f"    {mod}: rc={rc} {tail!r}")
        ok = ok and rc == 0
    if not ok:
        log("    capture SKIPPED: on-chip validation failed — a capture "
            "through a half-dead device would be invalid")
        return 0
    rc, tail = run_step(
        [sys.executable, os.path.join(REPO, "tools", "weather_capture.py"),
         "--force"], 2400, "weather_capture")
    log(f"    capture: rc={rc} {tail!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
