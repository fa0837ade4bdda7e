"""Quantitative reconstruction quality: upgrades must beat parity modes.

On a jittered, noisy acquisition (realistic stage error), the global
position solve must reconstruct the ground truth with lower error than
the reference's grid model — measured, not asserted by construction.
"""

import glob
import os

import numpy as np
import pytest

from fixtures import write_synthetic_acquisition
from image_stitcher_tpu import EngineOptions, stitch
from image_stitcher_tpu.io.zarr_store import open_zarr_array


def _reconstruction_rmse(desc, data, search: int = 24):
    """Translation-invariant RMS error vs ground truth.

    The stitched canvas origin differs per registration mode, so the
    comparison searches a small global offset; per-tile jitter errors
    cannot be absorbed by any single global shift, which is exactly what
    separates the grid model from the global solve."""
    ty0, tx0 = desc.tile_origins[("A1", 0, 0, 0)]
    gt = desc.ground_truth.astype(np.float64)
    canvas = data[0, 0, 0].astype(np.float64)
    # central window well inside both arrays
    ch, cw = canvas.shape
    win_h = min(ch, gt.shape[0] - ty0) - 2 * search - 2
    win_w = min(cw, gt.shape[1] - tx0) - 2 * search - 2
    got0 = canvas[search:search + win_h - search,
                  search:search + win_w - search]
    best = np.inf
    got_s = got0[::3, ::3]  # subsample: ranking-accurate, 9x cheaper
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            want = gt[ty0 + search + dy:ty0 + search + dy + got0.shape[0],
                      tx0 + search + dx:tx0 + search + dx + got0.shape[1]]
            rmse = np.sqrt(np.mean((got_s - want[::3, ::3]) ** 2))
            best = min(best, rmse)
    return float(best)


@pytest.fixture(scope="module")
def jittered(tmp_path_factory):
    base = tmp_path_factory.mktemp("quality")

    def make(name):
        acq_dir = str(base / name)
        write_synthetic_acquisition(
            acq_dir, grid_cols=5, grid_rows=5, tile_w=256, tile_h=256,
            overlap=64, jitter=5, noise=0.01, seed=21,
            acq_params_overrides={"pixel_binning": 2})
        return acq_dir

    return make


def _run(acq_dir, **opts):
    pipe = stitch(acq_dir, use_registration=True,
                  options=EngineOptions(**opts))
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    data = np.asarray(open_zarr_array(os.path.join(
        out, "0_stitched", "A1_stitched.ome.zarr", "0")).read().result())
    return pipe, data


def test_global_beats_grid_model_quantitatively(jittered):
    import sys
    sys.path.insert(0, "tests")
    from fixtures import SyntheticAcquisition  # noqa: F401

    acq_center = jittered("center")
    acq_global = jittered("global")

    # rebuild descriptors deterministically (same seed/params)
    from fixtures import write_synthetic_acquisition
    import tempfile
    desc_dir = tempfile.mkdtemp()
    desc = write_synthetic_acquisition(
        desc_dir, grid_cols=5, grid_rows=5, tile_w=256, tile_h=256,
        overlap=64, jitter=5, noise=0.01, seed=21,
        acq_params_overrides={"pixel_binning": 2})

    _, data_center = _run(acq_center, registration_scope='center')
    _, data_global = _run(acq_global, registration_scope='global',
                          blend_method='feather')

    rmse_center = _reconstruction_rmse(desc, data_center)
    rmse_global = _reconstruction_rmse(desc, data_global)

    # the grid model cannot express +-5 px per-tile jitter; the global
    # solve should cut reconstruction error by a large factor
    assert rmse_global < rmse_center * 0.35, (rmse_center, rmse_global)
    # and in absolute terms stay near the injected noise floor
    noise_floor = 0.01 * 65535
    assert rmse_global < 3 * noise_floor, (rmse_global, noise_floor)
