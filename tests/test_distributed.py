"""Multi-process (multi-host stand-in) distributed tests.

Two localhost processes federate via jax.distributed (Gloo CPU
collectives), build the pod (data=processes, canvas=local-devices)
mesh, psum across the DCN axis, and run ShardedCanvas fusion on the
global mesh with parity against the single-device kernel — the JAX
analogue of the reference's multi-worker Pool fan-out
(zarr_stitcher.py:570-612).
"""

import numpy as np
import pytest

from image_stitcher_tpu.parallel.distributed import run_localhost_validation


def test_two_process_localhost_validation():
    run_localhost_validation(num_processes=2, devices_per_process=2)


def test_work_sharded_pipeline_sequential(tmp_path):
    """Two shards run (sequentially here) into ONE shared output tree;
    each owns half the (t, region) units; the coordinator shard merges.
    Output equals an unsharded run."""
    import glob
    import os
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import EngineOptions, StitchingParameters
    from image_stitcher_tpu.io.zarr_store import open_zarr_array
    from image_stitcher_tpu.models.pipeline import StitchPipeline

    def make_acq(d):
        write_synthetic_acquisition(d, grid_cols=2, grid_rows=2, tile_w=64,
                                    tile_h=64, overlap=16,
                                    regions=["B2", "C3"], timepoints=2,
                                    seed=11)

    acq_dir = str(tmp_path / "acq")
    make_acq(acq_dir)
    shared = str(tmp_path / "out")
    params = StitchingParameters(input_folder=acq_dir,
                                 merge_hcs_regions=True)
    # shard 1 first (merges skipped there), then coordinator shard 0
    logs = []
    from image_stitcher_tpu.utils.progress import ProgressReporter
    rep = ProgressReporter(status=lambda m, s=False: logs.append(m))
    for idx in (1, 0):
        StitchPipeline(params, EngineOptions(
            output_folder=shared, work_shard=(idx, 2)), rep).run()
    assert any("coordinator shard" in m for m in logs)
    # every unit present exactly once, plus the merged plate from shard 0
    for t in (0, 1):
        for region in ("B2", "C3"):
            assert os.path.isdir(os.path.join(
                shared, f"{t}_stitched", f"{region}_stitched.ome.zarr"))
    plate = os.path.join(shared, "hcs_timepoints", "0_hcs.ome.zarr")
    assert os.path.isdir(plate)

    # equals an unsharded run
    acq2 = str(tmp_path / "acq2")
    make_acq(acq2)
    from image_stitcher_tpu import stitch
    stitch(acq2, merge_hcs_regions=True)
    ref_out = sorted(glob.glob(acq2 + "_stitched_*"))[-1]
    for t in (0, 1):
        for region in ("B2", "C3"):
            a = np.asarray(open_zarr_array(os.path.join(
                shared, f"{t}_stitched", f"{region}_stitched.ome.zarr",
                "0")).read().result())
            b = np.asarray(open_zarr_array(os.path.join(
                ref_out, f"{t}_stitched", f"{region}_stitched.ome.zarr",
                "0")).read().result())
            np.testing.assert_array_equal(a, b)


def test_work_sharded_resume_skips_completed(tmp_path):
    """A restarted shard reloads ITS manifest and skips finished units."""
    import os
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import EngineOptions, StitchingParameters
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu.utils.progress import ProgressReporter

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16,
                                regions=["B2", "C3"], seed=13)
    shared = str(tmp_path / "out")
    params = StitchingParameters(input_folder=acq_dir)
    opts = EngineOptions(output_folder=shared, work_shard=(0, 2))
    StitchPipeline(params, opts).run()
    logs = []
    rep = ProgressReporter(status=lambda m, s=False: logs.append(m))
    StitchPipeline(params, opts, rep, resume=True).run()
    assert any("Skipping completed region" in m for m in logs)


def test_stitch_distributed_two_processes(tmp_path):
    """Full e2e across two federated localhost processes: shared output
    tree, barrier, coordinator merges the HCS plate."""
    import os
    import socket
    import subprocess
    import sys
    from fixtures import write_synthetic_acquisition

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16,
                                regions=["B2", "C3"], seed=12)
    out_dir = str(tmp_path / "out")
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    script = f"""
import sys
pid = int(sys.argv[1])
from image_stitcher_tpu.parallel import distributed as dist
dist.initialize("localhost:{port}", num_processes=2, process_id=pid,
                platform='cpu')
from image_stitcher_tpu import EngineOptions, StitchingParameters
p = StitchingParameters(input_folder={acq_dir!r}, merge_hcs_regions=True)
pipe = dist.stitch_distributed(
    p, EngineOptions(output_folder={out_dir!r}))
print("worker", pid, "done", flush=True)
"""
    env = {k: v for k, v in os.environ.items() if k != 'JAX_PLATFORMS'}
    env['JAX_PLATFORMS'] = 'cpu'
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env,
                              cwd="/root/repo")
             for i in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out.decode()[-2000:]
    for region in ("B2", "C3"):
        assert os.path.isdir(os.path.join(
            out_dir, "0_stitched", f"{region}_stitched.ome.zarr"))
    assert os.path.isdir(os.path.join(out_dir, "hcs_timepoints",
                                      "0_hcs.ome.zarr", "B", "2", "0"))


def test_pod_mesh_single_process_shape():
    """Single-process fallback: the pod mesh equals a (1, n_local) grid
    with data across processes and canvas across local devices."""
    import jax
    from image_stitcher_tpu.parallel.distributed import make_pod_mesh
    mesh = make_pod_mesh()
    assert mesh.shape['data'] == jax.process_count()
    assert mesh.shape['canvas'] == len(jax.local_devices())

    with pytest.raises(ValueError):
        make_pod_mesh(local_shape=(3, 5))  # 15 != devices per process


def test_shard_death_barrier_timeout_and_resume(tmp_path):
    """Failure injection (VERDICT r2 #4): worker shard 1 dies mid-run.
    The coordinator must NOT deadlock in the pre-merge barrier — it
    fails within the configured timeout with recovery guidance. Then
    the dead shard re-runs with resume, the coordinator re-runs with
    resume, and the full tree (all units + the HCS plate) completes."""
    import glob
    import os
    import socket
    import subprocess
    import sys
    import time
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import EngineOptions, StitchingParameters
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu.utils.progress import ProgressReporter

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=64, tile_h=64, overlap=16,
                                regions=["B2", "C3"], timepoints=2,
                                seed=21)
    out_dir = str(tmp_path / "out")
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()

    # worker 1 dies after its FIRST completed unit (simulated crash);
    # the coordinator's barrier must time out, not hang
    script = f"""
import os, sys
pid = int(sys.argv[1])
from image_stitcher_tpu.parallel import distributed as dist
dist.initialize("localhost:{port}", num_processes=2, process_id=pid,
                platform='cpu')
from image_stitcher_tpu import EngineOptions, StitchingParameters
from image_stitcher_tpu.models.pipeline import StitchPipeline
if pid == 1:
    orig = StitchPipeline.save_region
    def dying_save(self, *a, **k):
        path = orig(self, *a, **k)
        os._exit(42)  # die right after the first unit lands on disk
    StitchPipeline.save_region = dying_save
p = StitchingParameters(input_folder={acq_dir!r}, merge_hcs_regions=True)
pipe = dist.stitch_distributed(
    p, EngineOptions(output_folder={out_dir!r},
                     merge_barrier_timeout_s=20.0,
                     pipelined_save=False))
print("worker", pid, "done", flush=True)
"""
    env = {k: v for k, v in os.environ.items() if k != 'JAX_PLATFORMS'}
    env['JAX_PLATFORMS'] = 'cpu'
    t0 = time.monotonic()
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env,
                              cwd="/root/repo")
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)  # far below the deadlock ∞
        outs.append(out.decode())
    elapsed = time.monotonic() - t0
    assert procs[1].returncode == 42          # injected death
    assert procs[0].returncode != 0           # coordinator failed, not hung
    assert elapsed < 150
    assert "shard barrier failed" in outs[0] or \
        "shard barrier failed" in outs[1] or \
        any("--resume" in o for o in outs), outs[0][-2000:]

    # --- recovery: re-run dead shard with resume (single-process mode,
    # barrier no-ops), then the coordinator with resume -> merges run
    params = StitchingParameters(input_folder=acq_dir,
                                 merge_hcs_regions=True)
    StitchPipeline(params, EngineOptions(
        output_folder=out_dir, work_shard=(1, 2),
        pipelined_save=False), resume=True).run()
    logs = []
    rep = ProgressReporter(status=lambda m, s=False: logs.append(m))
    StitchPipeline(params, EngineOptions(
        output_folder=out_dir, work_shard=(0, 2),
        pipelined_save=False), rep, resume=True).run()
    assert any("Skipping completed region" in m for m in logs)

    for t in (0, 1):
        for region in ("B2", "C3"):
            assert os.path.isdir(os.path.join(
                out_dir, f"{t}_stitched",
                f"{region}_stitched.ome.zarr")), (t, region)
    assert glob.glob(os.path.join(out_dir, "hcs_timepoints",
                                  "*_hcs.ome.zarr"))


# ---------------------------------------------------------------- barrier

def _barrier_pipeline(tmp_path, timeout_s):
    """A minimally-constructed pipeline for exercising _shard_barrier."""
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import EngineOptions, StitchingParameters
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    acq_dir = str(tmp_path / "barrier_acq")
    write_synthetic_acquisition(acq_dir, grid_cols=1, grid_rows=1,
                                tile_w=32, tile_h=32, overlap=8)
    return StitchPipeline(
        StitchingParameters(input_folder=acq_dir),
        EngineOptions(merge_barrier_timeout_s=timeout_s))


def test_shard_barrier_client_branch_gets_timeout(tmp_path, monkeypatch):
    """With the coordination client present, the barrier rides its timed
    wait_at_barrier (not sync_global_devices)."""
    import jax
    from jax._src import distributed as _dist
    pipe = _barrier_pipeline(tmp_path, timeout_s=7.0)
    calls = []

    class FakeClient:
        def wait_at_barrier(self, name, timeout_in_ms):
            calls.append((name, timeout_in_ms))

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(_dist.global_state, "client", FakeClient(),
                        raising=False)
    pipe._shard_barrier()
    assert calls == [("stitch_merge_barrier", 7000)]


def test_shard_barrier_fallback_is_bounded(tmp_path, monkeypatch):
    """Client absent: the sync_global_devices fallback must honor the
    timeout (timed thread), raising the recovery error instead of
    hanging forever on a dead shard."""
    import time

    import jax
    from jax._src import distributed as _dist
    from jax.experimental import multihost_utils
    pipe = _barrier_pipeline(tmp_path, timeout_s=0.5)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(_dist.global_state, "client", None, raising=False)
    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: time.sleep(60))
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="shard barrier failed"):
        pipe._shard_barrier()
    assert time.monotonic() - t0 < 10


def test_shard_barrier_fallback_propagates_success_and_errors(
        tmp_path, monkeypatch):
    """A fallback barrier that completes (or fails fast) surfaces that
    outcome, not a timeout."""
    import jax
    from jax._src import distributed as _dist
    from jax.experimental import multihost_utils
    pipe = _barrier_pipeline(tmp_path, timeout_s=30.0)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(_dist.global_state, "client", None, raising=False)

    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: None)
    pipe._shard_barrier()  # completes quietly

    def boom(name):
        raise ValueError("shard died")

    monkeypatch.setattr(multihost_utils, "sync_global_devices", boom)
    with pytest.raises(RuntimeError, match="shard died"):
        pipe._shard_barrier()


def test_shard_barrier_zero_timeout_keeps_untimed_path(
        tmp_path, monkeypatch):
    """merge_barrier_timeout_s=0 opts into the reference untimed
    collective (documented in EngineOptions)."""
    import jax
    from jax._src import distributed as _dist
    from jax.experimental import multihost_utils
    pipe = _barrier_pipeline(tmp_path, timeout_s=0.0)
    seen = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(_dist.global_state, "client", None, raising=False)
    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: seen.append(name))
    pipe._shard_barrier()
    assert seen == ["stitch_merge_barrier"]
