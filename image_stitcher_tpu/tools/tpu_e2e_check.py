"""On-chip PIPELINE burn-in: device backends vs host, byte parity.

The pytest suite runs on the CPU backend where the Mosaic (pallas)
paths are replaced by the XLA scan, so pipeline wiring that only
activates on real TPUs — the fused-flatfield placement kernel, the
HBM-banded streaming fuser, the device flatfield solve — needs an
on-hardware end-to-end check. This caught two real bugs: the TPU
reciprocal-approximated f32 divide (round 2) and the streaming band
path feeding channel-0's flatfield to every band (fused-ff wiring).

Run after any kernel/pipeline change, alongside tpu_kernel_check:

    python -m image_stitcher_tpu.tools.tpu_e2e_check
"""

import glob
import os
import shutil
import sys
import tempfile

import numpy as np


def main() -> None:
    # the synthetic-acquisition fixture generator lives in tests/
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo_root, 'tests'))
    from fixtures import write_synthetic_acquisition

    from image_stitcher_tpu import EngineOptions, stitch
    from image_stitcher_tpu.io.zarr_store import open_zarr_array

    workdir = tempfile.mkdtemp(prefix="tpu_e2e_check_")
    configs = {
        "host": dict(fusion_device='host', streaming='off'),
        "device_xla": dict(fusion_device='device', streaming='off',
                           device_fusion_kernel='xla'),
        "device_pallas": dict(fusion_device='device', streaming='off',
                              device_fusion_kernel='pallas'),
        "device_pallas_stream": dict(fusion_device='device', streaming='on',
                                     device_fusion_kernel='pallas',
                                     chunks=(1, 1, 1, 128, 128)),
        # shard_map + Mosaic composition (single-chip mesh; pods shard
        # the same code over more devices)
        "mesh_pallas": dict(mesh_shape=(1, 1), streaming='off',
                            device_fusion_kernel='pallas'),
    }
    results = {}
    try:
        for name, opts in configs.items():
            acq = os.path.join(workdir, name)
            # 128^2 tiles: register-aligned for pallas; 2 channels so
            # per-channel flatfield selection is actually exercised
            write_synthetic_acquisition(
                acq, grid_cols=3, grid_rows=3, tile_w=128, tile_h=128,
                overlap=32, seed=11, jitter=2,
                channels=["Fluorescence 405 nm Ex",
                          "Fluorescence 488 nm Ex"],
                acq_params_overrides={"pixel_binning": 2})
            stitch(acq, use_registration=True, apply_flatfield=True,
                   options=EngineOptions(**opts))
            out = sorted(glob.glob(acq + "_stitched_*"))[-1]
            results[name] = np.asarray(open_zarr_array(os.path.join(
                out, "0_stitched", "A1_stitched.ome.zarr", "0"))
                .read().result())
            print(f"{name}: done", flush=True)
        ref = results.pop("host")
        fails = 0
        for name, data in results.items():
            same = np.array_equal(data, ref)
            print(f"{name}: byte-equal={'OK' if same else 'FAIL'}",
                  flush=True)
            fails += not same

        # feather (quality mode): host vs device-pallas, <=1 LSB (f32
        # accumulation order)
        fresults = {}
        for name, opts in {
            "host_feather": dict(fusion_device='host', streaming='off'),
            "pallas_feather": dict(fusion_device='device', streaming='off',
                                   device_fusion_kernel='pallas'),
            "pallas_feather_stream": dict(fusion_device='device',
                                          streaming='on',
                                          device_fusion_kernel='pallas',
                                          chunks=(1, 1, 1, 128, 128)),
            "mesh_pallas_feather": dict(mesh_shape=(1, 1), streaming='off',
                                        device_fusion_kernel='pallas'),
        }.items():
            acq = os.path.join(workdir, name)
            write_synthetic_acquisition(
                acq, grid_cols=3, grid_rows=3, tile_w=128, tile_h=128,
                overlap=32, seed=11, jitter=2,
                channels=["Fluorescence 405 nm Ex",
                          "Fluorescence 488 nm Ex"],
                acq_params_overrides={"pixel_binning": 2})
            stitch(acq, use_registration=True, apply_flatfield=True,
                   options=EngineOptions(blend_method='feather',
                                         feather_px=24, **opts))
            out = sorted(glob.glob(acq + "_stitched_*"))[-1]
            fresults[name] = np.asarray(open_zarr_array(os.path.join(
                out, "0_stitched", "A1_stitched.ome.zarr", "0"))
                .read().result())
        fref = fresults.pop("host_feather").astype(int)
        for name, data in fresults.items():
            diff = int(np.abs(data.astype(int) - fref).max())
            print(f"{name}: maxdiff={diff} "
                  f"({'OK' if diff <= 1 else 'FAIL'})", flush=True)
            fails += diff > 1
        print("FAILS:", fails)
        assert fails == 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == '__main__':
    main()
