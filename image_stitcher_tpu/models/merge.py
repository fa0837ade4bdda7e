"""Merge passes: timepoint series and HCS plate layouts.

Parity with the reference post-passes (stitcher.py:900-1218):
- merge_timepoints_per_region: re-open per-timepoint region outputs, pad
  to the largest shape, stack along T, re-pyramid, write
  ``region_time_series/{region}_time_series.ome.zarr``.
- create_hcs_ome_zarr_per_timepoint: per-timepoint OME-Zarr HCS plate
  (rows = region[0], columns = region[1:]) at ``hcs_timepoints/{t}_hcs.ome.zarr``.
- create_complete_hcs_ome_zarr: single plate with merged timepoints at
  ``hcs_timepoints/complete_hcs.ome.zarr``.

Unlike the reference (which materializes merged dask arrays), merges
stream band-by-band: each chunk-aligned row band is read from the source
level 0, written, and folded into every pyramid level — peak memory is
one band, independent of volume size (the same discipline as
models/streaming). Merges downsample with the 2x2 mean, matching the
reference merge paths (da.coarsen(np.mean), stitcher.py:887-898) rather
than its nearest-mode save path.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ..io.omezarr import (DEFAULT_MAX_PENDING_BYTES, MultiscaleWriter,
                          plate_attrs, well_attrs)
from ..io.zarr_store import open_zarr_array, write_group
from ..ops.host_fuse import host_downsample
from .streaming import band_rows_for

MERGE_DOWNSAMPLE = 'mean'


def _group_attrs(zarr_format: int, **members):
    """Plate/well attrs: bare for NGFF 0.4 (zarr v2), wrapped under the
    versioned 'ome' key for NGFF 0.5 (zarr v3)."""
    if zarr_format == 3:
        from ..io.omezarr import ngff05_wrap
        return ngff05_wrap(**{k: ({kk: vv for kk, vv in v.items()
                                   if kk != 'version'}
                                  if isinstance(v, dict) else v)
                              for k, v in members.items()})
    return dict(members)


def _region_level0_path(pipeline, t, region: str) -> str:
    return os.path.join(
        pipeline.output_folder, f"{t}_stitched",
        f"{region}_stitched{pipeline.output_format}", "0")


def _open_region_level0(pipeline, t, region: str):
    return open_zarr_array(_region_level0_path(pipeline, t, region))


def _unit_exists(pipeline, t, region: str) -> bool:
    """A (timepoint, region) stitched store is present AND complete.
    Units can be missing legitimately: continue_on_error skipped a
    failed region, or a resumed run never reached it — merges skip
    those with a message instead of crashing after all stitching
    succeeded.

    "Complete" requires BOTH records to agree: the run manifests'
    completed list (a region that died mid-save under continue_on_error
    leaves a partially written store on disk — its directory existing
    does NOT make it mergeable) AND the level-0 array metadata on disk
    (an operator may have deleted a bad store after the run). Under
    work sharding the coordinator's own manifest only records its OWN
    units, so all shard manifests in the output folder are unioned.
    Without any manifest (merge invoked standalone on an existing
    tree) the on-disk metadata decides alone."""
    completed = _completed_units(pipeline)
    if completed is not None and f"{t}/{region}" not in completed:
        return False
    level0 = _region_level0_path(pipeline, t, region)
    return (os.path.exists(os.path.join(level0, '.zarray'))
            or os.path.exists(os.path.join(level0, 'zarr.json')))


def _completed_units(pipeline):
    """Union of completed (t, region) keys across every shard manifest
    in the output folder, or None when no manifest exists. Cached on
    the pipeline for the duration of the merge pass (manifests don't
    change once every shard has passed the pre-merge barrier)."""
    _unset = object()
    cached = getattr(pipeline, '_merge_completed_units', _unset)
    if cached is not _unset:
        return cached
    import glob as _glob
    import json as _json
    from ..utils.manifest import MANIFEST_NAME
    keys = set()
    paths = _glob.glob(os.path.join(pipeline.output_folder,
                                    MANIFEST_NAME + '*'))
    paths = [p for p in paths if not p.endswith('.tmp')]
    if not paths:
        # cache the no-manifest answer too: standalone merges would
        # otherwise re-glob the folder for every (t, region) unit
        pipeline._merge_completed_units = None
        return None
    for p in paths:
        try:
            with open(p) as f:
                keys.update(_json.load(f).get('completed', []))
        except Exception:
            continue
    pipeline._merge_completed_units = keys
    return keys


def _regions_with_all_timepoints(pipeline):
    out = []
    for region in pipeline.acq.regions:
        missing = [int(t) for t in pipeline.acq.timepoints
                   if not _unit_exists(pipeline, int(t), region)]
        if missing:
            pipeline.reporter.status(
                f"merge: skipping region {region} (missing stitched "
                f"output for timepoint(s) {missing})", False)
        else:
            out.append(region)
    return out


def _max_region_shape(pipeline, region: str) -> Tuple[int, ...]:
    shapes = []
    for t in pipeline.acq.timepoints:
        arr = _open_region_level0(pipeline, int(t), region)
        shapes.append(tuple(arr.shape))
    return tuple(max(s) for s in zip(*shapes))


def _stream_volume_banded(pipeline, writer: MultiscaleWriter, src_arr,
                          ti: int, num_levels: int) -> None:
    """Copy one timepoint's volume into the writer band by band,
    downsampling each band into every pyramid level — peak memory is one
    band, never the volume (the merge counterpart of models/streaming)."""
    _, c, z, h, w = src_arr.shape
    band = band_rows_for(pipeline.options.write_band_rows(), num_levels)
    for band0 in range(0, h, band):
        rows = min(band, h - band0)
        slab = np.asarray(
            src_arr[0:1, :, :, band0:band0 + rows, :].read().result())
        writer.write_level(0, slab, sel=(
            slice(ti, ti + 1), slice(None), slice(None),
            slice(band0, band0 + rows), slice(0, w)))
        level = slab[0]  # (C, Z, rows, W)
        for lv in range(1, num_levels):
            level = host_downsample(level, MERGE_DOWNSAMPLE)
            h_lv, w_lv = level.shape[-2], level.shape[-1]
            if h_lv == 0 or w_lv == 0:
                break
            b_lv = band0 >> lv
            writer.write_level(lv, level[None], sel=(
                slice(ti, ti + 1), slice(None), slice(None),
                slice(b_lv, b_lv + h_lv), slice(0, w_lv)))


def _stream_timepoints(pipeline, writer: MultiscaleWriter, region: str,
                       num_levels: int):
    """Write each timepoint's pyramid slab-by-slab into a T-stacked store."""
    for ti, t in enumerate(pipeline.acq.timepoints):
        src = _open_region_level0(pipeline, int(t), region)
        _stream_volume_banded(pipeline, writer, src, ti, num_levels)
    writer.close()


def _make_image_writer(pipeline, path: str, base_shape, name: str,
                       omero_full: bool = False,
                       n_concurrent: int = 1) -> MultiscaleWriter:
    acq = pipeline.acq
    opts = pipeline.options
    cname, clevel, shuffle = pipeline.resolved_compressor()
    return MultiscaleWriter(
        path, base_shape, pipeline.num_pyramid_levels, acq.dtype, opts.chunks,
        name, acq.dz_um, acq.pixel_size_um, acq.monochrome_channels,
        acq.monochrome_colors, cname=cname,
        clevel=clevel, shuffle=shuffle,
        omero_full=omero_full, zarr_format=opts.zarr_format,
        direct_io=opts.direct_io,
        # concurrent merge writers split the default backpressure
        # window so the merge phase's pending-bytes ceiling stays what
        # a single sequential writer had
        max_pending_bytes=DEFAULT_MAX_PENDING_BYTES // max(1, n_concurrent))


def _merge_worker_count(n_units: int) -> int:
    from ..params import _available_cpus
    return max(1, min(4, _available_cpus(), n_units))


def _map_merge_units(pipeline, units, fn) -> None:
    """Run independent per-unit merge jobs (separate writers, separate
    output trees) on a small pool: the pool sizes to the schedulable
    CPUs so a one-core host runs exactly the old sequential order while
    multi-core hosts merge units concurrently. Peak memory stays
    bounded: pool-size band slabs plus one writer backpressure window
    split across the pool (``_make_image_writer`` divides
    max_pending_bytes by the worker count). On the first failure —
    including KeyboardInterrupt — queued units are cancelled and the
    error re-raises once running units finish (threads cannot be
    killed; a running writer is never abandoned mid-file).

    ``fn(unit, n_concurrent)`` receives the pool size so its writers
    can split the backpressure window by the ACTUAL worker count (a
    per-unit recompute could diverge if CPU affinity changes mid-run).
    """
    if not units:
        return
    workers = _merge_worker_count(len(units))
    if workers == 1:
        for u in units:
            fn(u, 1)
        return
    # warm the lazy compressor probe on the main thread so workers
    # never race its check-then-set (it is also lock-guarded)
    pipeline.resolved_compressor()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(workers) as pool:
        futures = [pool.submit(fn, u, workers) for u in units]
        try:
            for fut in futures:
                fut.result()
        except BaseException:
            for f in futures:
                f.cancel()
            raise


def merge_timepoints_per_region(pipeline) -> str:
    """{output}/region_time_series/{region}_time_series.ome.zarr per region
    (reference stitcher.py:900-965)."""
    out_dir = os.path.join(pipeline.output_folder, "region_time_series")
    os.makedirs(out_dir, exist_ok=True)
    num_t = len(pipeline.acq.timepoints)
    regions = _regions_with_all_timepoints(pipeline)
    output_path = ''

    def merge_one(region, n_concurrent):
        path = os.path.join(
            out_dir, f"{region}_time_series{pipeline.output_format}")
        max_shape = _max_region_shape(pipeline, region)
        base_shape = (num_t,) + tuple(max_shape[1:])
        writer = _make_image_writer(
            pipeline, path, base_shape, f"Region_{region}",
            n_concurrent=n_concurrent)
        _stream_timepoints(pipeline, writer, region,
                           pipeline.num_pyramid_levels)

    _map_merge_units(pipeline, regions, merge_one)
    if regions:
        output_path = os.path.join(
            out_dir, f"{regions[-1]}_time_series{pipeline.output_format}")
    return output_path


def _write_well_tree(pipeline, plate_root: str, region: str, name: str,
                     base_shape, stream_fn, n_concurrent: int = 1) -> None:
    """Create {row}/{col}/0 hierarchy with well metadata and image data."""
    row, col = region[0], region[1:]
    zf = pipeline.options.zarr_format
    write_group(os.path.join(plate_root, row), zarr_format=zf)
    write_group(os.path.join(plate_root, row, col),
                _group_attrs(zf, well=well_attrs()["well"]),
                zarr_format=zf)
    image_path = os.path.join(plate_root, row, col, "0")
    writer = _make_image_writer(pipeline, image_path, base_shape, name,
                                n_concurrent=n_concurrent)
    stream_fn(writer)


def create_hcs_ome_zarr_per_timepoint(pipeline) -> str:
    """One HCS plate per timepoint (reference stitcher.py:1008-1119)."""
    out_dir = os.path.join(pipeline.output_folder, "hcs_timepoints")
    os.makedirs(out_dir, exist_ok=True)
    output_path = ''
    for t in pipeline.acq.timepoints:
        t = int(t)
        regions = [r for r in pipeline.acq.regions
                   if _unit_exists(pipeline, t, r)]
        skipped = [r for r in pipeline.acq.regions if r not in regions]
        if skipped:
            pipeline.reporter.status(
                f"merge: plate t={t} skips missing region(s) {skipped}",
                False)
        if not regions:
            continue
        output_path = os.path.join(out_dir, f"{t}_hcs{pipeline.output_format}")
        zf = pipeline.options.zarr_format
        write_group(output_path, _group_attrs(zf, **plate_attrs(
            regions, f"HCS Dataset - Timepoint {t}",
            f"Timepoint {t} Acquisition")), zarr_format=zf)

        def well_one(region, n_concurrent, t=t, output_path=output_path):
            src = _open_region_level0(pipeline, t, region)
            shape = tuple(src.shape)

            def stream(writer, src=src):
                _stream_volume_banded(pipeline, writer, src, 0,
                                      pipeline.num_pyramid_levels)
                writer.close()

            _write_well_tree(pipeline, output_path, region,
                             f"Well_{region}_t{t}", shape, stream,
                             n_concurrent=n_concurrent)

        _map_merge_units(pipeline, regions, well_one)
    return output_path


def create_complete_hcs_ome_zarr(pipeline) -> str:
    """Single plate with merged timepoints (reference stitcher.py:1121-1218)."""
    out_dir = os.path.join(pipeline.output_folder, "hcs_timepoints")
    os.makedirs(out_dir, exist_ok=True)
    output_path = os.path.join(out_dir, f"complete_hcs{pipeline.output_format}")
    regions = _regions_with_all_timepoints(pipeline)
    if not regions:
        pipeline.reporter.status(
            "merge: no region has a complete set of stitched outputs; "
            "skipping the complete plate", False)
        return ''
    zf = pipeline.options.zarr_format
    write_group(output_path, _group_attrs(zf, **plate_attrs(
        regions, "Complete HCS Dataset", "Stitched Acquisition")),
        zarr_format=zf)
    num_t = len(pipeline.acq.timepoints)

    def well_one(region, n_concurrent):
        max_shape = _max_region_shape(pipeline, region)
        base_shape = (num_t,) + tuple(max_shape[1:])

        def stream(writer, region=region):
            _stream_timepoints(pipeline, writer, region,
                               pipeline.num_pyramid_levels)

        _write_well_tree(pipeline, output_path, region, f"Well_{region}",
                         base_shape, stream, n_concurrent=n_concurrent)

    _map_merge_units(pipeline, regions, well_one)
    return output_path


def run_merges(pipeline) -> str:
    """Dispatch merge passes per flags (reference stitcher.py:1283-1291).

    Merges are zarr-only (the reference GUIs gated the checkboxes to the
    zarr format, stitcher_gui.py:254-260; its CLI would crash). We skip
    with a clear message instead.
    """
    if not pipeline.output_format.endswith('.zarr'):
        pipeline.reporter.error(
            "merge passes require .ome.zarr output; skipping merges")
        return pipeline.saved_paths[-1] if pipeline.saved_paths else ''
    if pipeline.params.merge_timepoints and pipeline.params.merge_hcs_regions:
        return create_complete_hcs_ome_zarr(pipeline)
    if pipeline.params.merge_timepoints:
        return merge_timepoints_per_region(pipeline)
    return create_hcs_ome_zarr_per_timepoint(pipeline)
