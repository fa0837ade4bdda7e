"""Merge passes: timepoint series and HCS plate layouts.

Parity with the reference post-passes (stitcher.py:900-1218):
- merge_timepoints_per_region: re-open per-timepoint region outputs, pad
  to the largest shape, stack along T, re-pyramid, write
  ``region_time_series/{region}_time_series.ome.zarr``.
- create_hcs_ome_zarr_per_timepoint: per-timepoint OME-Zarr HCS plate
  (rows = region[0], columns = region[1:]) at ``hcs_timepoints/{t}_hcs.ome.zarr``.
- create_complete_hcs_ome_zarr: single plate with merged timepoints at
  ``hcs_timepoints/complete_hcs.ome.zarr``.

Unlike the reference (which materializes merged dask arrays), every merge
streams one timepoint volume at a time: read level 0 -> device -> iterated
downsample -> async slab writes, so peak memory is one region volume.
Merges downsample with the 2x2 mean, matching the reference merge paths
(da.coarsen(np.mean), stitcher.py:887-898) rather than its nearest-mode
save path.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..io.omezarr import MultiscaleWriter, plate_attrs, well_attrs
from ..io.zarr_store import open_zarr_array, write_group
from ..ops import pyramid as pyr_ops

MERGE_DOWNSAMPLE = 'mean'


def _region_level0_path(pipeline, t, region: str) -> str:
    return os.path.join(
        pipeline.output_folder, f"{t}_stitched",
        f"{region}_stitched{pipeline.output_format}", "0")


def _load_region_volume(pipeline, t, region: str) -> Tuple[np.ndarray, Tuple[int, ...]]:
    arr = open_zarr_array(_region_level0_path(pipeline, t, region))
    data = np.asarray(arr.read().result())
    return data, data.shape


def _max_region_shape(pipeline, region: str) -> Tuple[int, ...]:
    shapes = []
    for t in pipeline.acq.timepoints:
        arr = open_zarr_array(_region_level0_path(pipeline, int(t), region))
        shapes.append(tuple(arr.shape))
    return tuple(max(s) for s in zip(*shapes))


def _stream_timepoints(pipeline, writer: MultiscaleWriter, region: str,
                       num_levels: int):
    """Write each timepoint's pyramid slab-by-slab into a T-stacked store."""
    for ti, t in enumerate(pipeline.acq.timepoints):
        data, shape = _load_region_volume(pipeline, int(t), region)
        level = jnp.asarray(data[0])  # (C, Z, H, W)
        for lv in range(num_levels):
            if lv > 0:
                level = pyr_ops.downsample(level, MERGE_DOWNSAMPLE)
            h, w = level.shape[-2], level.shape[-1]
            sel = (slice(ti, ti + 1), slice(None), slice(None),
                   slice(0, h), slice(0, w))
            writer.write_level(lv, np.asarray(level)[None], sel=sel)
    writer.close()


def _make_image_writer(pipeline, path: str, base_shape, name: str,
                       omero_full: bool = False) -> MultiscaleWriter:
    acq = pipeline.acq
    opts = pipeline.options
    return MultiscaleWriter(
        path, base_shape, pipeline.num_pyramid_levels, acq.dtype, opts.chunks,
        name, acq.dz_um, acq.pixel_size_um, acq.monochrome_channels,
        acq.monochrome_colors, cname=opts.compressor_cname,
        clevel=opts.compressor_clevel, shuffle=opts.compressor_shuffle,
        omero_full=omero_full)


def merge_timepoints_per_region(pipeline) -> str:
    """{output}/region_time_series/{region}_time_series.ome.zarr per region
    (reference stitcher.py:900-965)."""
    out_dir = os.path.join(pipeline.output_folder, "region_time_series")
    os.makedirs(out_dir, exist_ok=True)
    output_path = ''
    num_t = len(pipeline.acq.timepoints)
    for region in pipeline.acq.regions:
        output_path = os.path.join(
            out_dir, f"{region}_time_series{pipeline.output_format}")
        max_shape = _max_region_shape(pipeline, region)
        base_shape = (num_t,) + tuple(max_shape[1:])
        writer = _make_image_writer(pipeline, output_path, base_shape,
                                    f"Region_{region}")
        _stream_timepoints(pipeline, writer, region, pipeline.num_pyramid_levels)
    return output_path


def _write_well_tree(pipeline, plate_root: str, region: str, name: str,
                     base_shape, stream_fn) -> None:
    """Create {row}/{col}/0 hierarchy with well metadata and image data."""
    row, col = region[0], region[1:]
    write_group(os.path.join(plate_root, row))
    write_group(os.path.join(plate_root, row, col), well_attrs())
    image_path = os.path.join(plate_root, row, col, "0")
    writer = _make_image_writer(pipeline, image_path, base_shape, name)
    stream_fn(writer)


def create_hcs_ome_zarr_per_timepoint(pipeline) -> str:
    """One HCS plate per timepoint (reference stitcher.py:1008-1119)."""
    out_dir = os.path.join(pipeline.output_folder, "hcs_timepoints")
    os.makedirs(out_dir, exist_ok=True)
    output_path = ''
    regions = pipeline.acq.regions
    for t in pipeline.acq.timepoints:
        t = int(t)
        output_path = os.path.join(out_dir, f"{t}_hcs{pipeline.output_format}")
        write_group(output_path, plate_attrs(
            regions, f"HCS Dataset - Timepoint {t}", f"Timepoint {t} Acquisition"))
        for region in regions:
            data, shape = _load_region_volume(pipeline, t, region)

            def stream(writer, data=data):
                level = jnp.asarray(data[0])
                for lv in range(pipeline.num_pyramid_levels):
                    if lv > 0:
                        level = pyr_ops.downsample(level, MERGE_DOWNSAMPLE)
                    writer.write_level(lv, np.asarray(level)[None])
                writer.close()

            _write_well_tree(pipeline, output_path, region,
                             f"Well_{region}_t{t}", shape, stream)
    return output_path


def create_complete_hcs_ome_zarr(pipeline) -> str:
    """Single plate with merged timepoints (reference stitcher.py:1121-1218)."""
    out_dir = os.path.join(pipeline.output_folder, "hcs_timepoints")
    os.makedirs(out_dir, exist_ok=True)
    output_path = os.path.join(out_dir, f"complete_hcs{pipeline.output_format}")
    regions = pipeline.acq.regions
    write_group(output_path, plate_attrs(
        regions, "Complete HCS Dataset", "Stitched Acquisition"))
    num_t = len(pipeline.acq.timepoints)
    for region in regions:
        max_shape = _max_region_shape(pipeline, region)
        base_shape = (num_t,) + tuple(max_shape[1:])

        def stream(writer, region=region):
            _stream_timepoints(pipeline, writer, region,
                               pipeline.num_pyramid_levels)

        _write_well_tree(pipeline, output_path, region, f"Well_{region}",
                         base_shape, stream)
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
