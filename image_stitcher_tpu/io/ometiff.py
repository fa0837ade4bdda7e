"""OME-TIFF output path (pyramidal BigTIFF).

Counterpart of the reference's .ome.tiff writers (save_region_aics /
save_region_vips, stitcher_process.py:958-1549). Implemented natively in
io/tiffwriter.py; this module adapts the pipeline to it.
"""

from __future__ import annotations

import numpy as np


def tiff_rgb_mode(acq) -> bool:
    """True when the acquisition writes true SamplesPerPixel=3 RGB
    pages (channels expanded to {ch}_R/_G/_B), matching the reference's
    production RGB TIFF path (stitcher_process.py:1429-1549)."""
    mono = list(acq.monochrome_channels)
    return (len(mono) == 3 and len(acq.rgb_channels) > 0
            and [m.rsplit('_', 1)[-1] for m in mono] == ['R', 'G', 'B'])


def region_position_um(acq, t, region: str):
    """Stage origin of a region, recorded per OME-XML Plane (mm->um)."""
    xs, ys = acq.region_positions(int(t), region)
    return (min(xs) * 1000.0, min(ys) * 1000.0) if xs and ys else None


def write_ome_tiff_region(pipeline, t, region: str, canvas, output_path: str,
                          num_levels=None) -> str:
    from .tiffwriter import write_ome_tiff_pyramid
    from ..ops.pyramid import iter_levels

    acq = pipeline.acq
    if num_levels is None:
        num_levels = pipeline.num_pyramid_levels
    # in-RAM path (small canvases): the writer takes the full level
    # list (peak memory ~1.33x the canvas). Large canvases — monochrome
    # AND RGB — stream band-wise through StreamingTiffWriter instead
    # (pipeline._stitch_and_save_streaming).
    levels = [np.asarray(level) for level in iter_levels(
        canvas, num_levels, pipeline.options.pyramid_downsample)]
    mono = list(acq.monochrome_channels)
    rgb = tiff_rgb_mode(acq)
    position_um = region_position_um(acq, t, region)
    write_ome_tiff_pyramid(
        output_path, levels,
        image_name=f"{region}_t{t}",
        channel_names=mono,
        channel_colors=acq.monochrome_colors,
        pixel_size_um=acq.pixel_size_um,
        dz_um=acq.dz_um,
        rgb=rgb,
        position_um=position_um,
        compression=pipeline.options.tiff_compression,
        jpeg_quality=pipeline.options.tiff_jpeg_quality)
    return output_path
