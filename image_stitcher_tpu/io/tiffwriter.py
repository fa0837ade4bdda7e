"""Pyramidal OME-TIFF (BigTIFF) writer, implemented from the TIFF spec.

The environment has no tifffile/pyvips, so this writes the container
directly: BigTIFF (version 43, 8-byte offsets), tiled pages, Deflate
compression, OME-XML in ImageDescription, and reduced-resolution pyramid
levels attached via SubIFDs (the layout the reference produced through
tifffile's ``subifds=`` API, stitcher_process.py:1344-1427).

Layout: one top-level IFD per (C, Z) plane of level 0, chained; each
carries SubIFDs pointing to its own pyramid levels (NewSubfileType=1).
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Optional, Sequence

import numpy as np

# TIFF tag ids
T_NEWSUBFILETYPE = 254
T_IMAGEWIDTH = 256
T_IMAGELENGTH = 257
T_BITSPERSAMPLE = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_IMAGEDESCRIPTION = 270
T_SAMPLESPERPIXEL = 277
T_SOFTWARE = 305
T_TILEWIDTH = 322
T_TILELENGTH = 323
T_TILEOFFSETS = 324
T_TILEBYTECOUNTS = 325
T_SUBIFDS = 330
T_SAMPLEFORMAT = 339
T_PLANARCONFIG = 284

# TIFF types
TY_SHORT = 3      # u16
TY_LONG = 4       # u32
TY_ASCII = 2
TY_LONG8 = 16     # u64
TY_IFD8 = 18

_TY_SIZE = {TY_SHORT: 2, TY_LONG: 4, TY_ASCII: 1, TY_LONG8: 8, TY_IFD8: 8}
_TY_FMT = {TY_SHORT: '<H', TY_LONG: '<I', TY_LONG8: '<Q', TY_IFD8: '<Q'}

TILE_SIZE = 256


def _sample_format(dtype: np.dtype) -> int:
    if np.issubdtype(dtype, np.floating):
        return 3
    if np.issubdtype(dtype, np.signedinteger):
        return 2
    return 1


class BigTiffWriter:
    """Minimal streaming BigTIFF writer with SubIFD pyramid support."""

    def __init__(self, path: str, compression: str = 'deflate',
                 compression_level: int = 1, tile_size: int = TILE_SIZE):
        self.f = open(path, 'wb')
        self.compression = compression
        self.level = compression_level
        self.tile = tile_size
        # BigTIFF header: II, 43, offsetsize 8, pad 0, first IFD offset (patched)
        self.f.write(struct.pack('<2sHHHQ', b'II', 43, 8, 0, 0))
        self._first_ifd_patch = 8
        self._prev_next_patch: Optional[int] = None

    def _align(self):
        pos = self.f.tell()
        if pos % 2:
            self.f.write(b'\x00')

    def _write_tiles(self, plane: np.ndarray):
        """Compress and write tile data; returns (offsets, bytecounts).

        ``plane`` is (h, w) monochrome or (h, w, 3) interleaved RGB
        (PlanarConfiguration=1: samples contiguous within each tile).
        """
        h, w = plane.shape[:2]
        spp = plane.shape[2] if plane.ndim == 3 else 1
        ts = self.tile
        offsets, counts = [], []
        for ty in range(0, h, ts):
            for tx in range(0, w, ts):
                shape = (ts, ts, spp) if spp > 1 else (ts, ts)
                block = np.zeros(shape, plane.dtype)
                sub = plane[ty:ty + ts, tx:tx + ts]
                block[:sub.shape[0], :sub.shape[1]] = sub
                raw = block.tobytes()
                data = zlib.compress(raw, self.level) \
                    if self.compression == 'deflate' else raw
                self._align()
                offsets.append(self.f.tell())
                counts.append(len(data))
                self.f.write(data)
        return offsets, counts

    def _write_ifd(self, entries, chain: bool) -> int:
        """entries: list of (tag, type, values:list|bytes). Returns IFD offset.

        When ``chain`` is True the IFD is linked into the top-level chain;
        otherwise (SubIFD) its next-pointer is left 0.
        """
        # First materialize out-of-line values
        processed = []
        for tag, ty, values in sorted(entries, key=lambda e: e[0]):
            if ty == TY_ASCII:
                data = values if isinstance(values, bytes) else values.encode()
                if not data.endswith(b'\x00'):
                    data += b'\x00'
                count = len(data)
                raw = data
            else:
                count = len(values)
                raw = b''.join(struct.pack(_TY_FMT[ty], int(v)) for v in values)
            if len(raw) <= 8:
                processed.append((tag, ty, count, raw.ljust(8, b'\x00')))
            else:
                self._align()
                off = self.f.tell()
                self.f.write(raw)
                processed.append((tag, ty, count, struct.pack('<Q', off)))

        self._align()
        ifd_offset = self.f.tell()
        self.f.write(struct.pack('<Q', len(processed)))
        for tag, ty, count, val8 in processed:
            self.f.write(struct.pack('<HHQ', tag, ty, count) + val8)
        next_patch_pos = self.f.tell()
        self.f.write(struct.pack('<Q', 0))

        if chain:
            patch_at = self._prev_next_patch if self._prev_next_patch is not None \
                else self._first_ifd_patch
            end = self.f.tell()
            self.f.seek(patch_at)
            self.f.write(struct.pack('<Q', ifd_offset))
            self.f.seek(end)
            self._prev_next_patch = next_patch_pos
        return ifd_offset

    def add_plane(self, levels: Sequence[np.ndarray],
                  description: Optional[str] = None,
                  subfile_type: int = 0):
        """Write one plane: levels[0] as a top-level page, the rest as its
        SubIFD reduced-resolution pages."""
        sub_offsets = []
        for lv in levels[1:]:
            offs, cnts = self._write_tiles(lv)
            sub_offsets.append(self._write_ifd(
                self._plane_entries(lv, offs, cnts, subfile=1), chain=False))
        plane = levels[0]
        offs, cnts = self._write_tiles(plane)
        entries = self._plane_entries(plane, offs, cnts, subfile=subfile_type)
        if description is not None:
            entries.append((T_IMAGEDESCRIPTION, TY_ASCII, description))
        if sub_offsets:
            entries.append((T_SUBIFDS, TY_IFD8, sub_offsets))
        self._write_ifd(entries, chain=True)

    def _plane_entries(self, plane: np.ndarray, offsets, counts, subfile: int):
        h, w = plane.shape[:2]
        spp = plane.shape[2] if plane.ndim == 3 else 1
        bits = plane.dtype.itemsize * 8
        comp = 8 if self.compression == 'deflate' else 1
        entries = [
            (T_NEWSUBFILETYPE, TY_LONG, [subfile]),
            (T_IMAGEWIDTH, TY_LONG, [w]),
            (T_IMAGELENGTH, TY_LONG, [h]),
            (T_BITSPERSAMPLE, TY_SHORT, [bits] * spp),
            (T_COMPRESSION, TY_SHORT, [comp]),
            (T_PHOTOMETRIC, TY_SHORT, [2 if spp == 3 else 1]),
            (T_SAMPLESPERPIXEL, TY_SHORT, [spp]),
            (T_SOFTWARE, TY_ASCII, 'image_stitcher_tpu'),
            (T_TILEWIDTH, TY_SHORT, [self.tile]),
            (T_TILELENGTH, TY_SHORT, [self.tile]),
            (T_TILEOFFSETS, TY_LONG8, offsets),
            (T_TILEBYTECOUNTS, TY_LONG8, counts),
            (T_SAMPLEFORMAT, TY_SHORT, [_sample_format(plane.dtype)] * spp),
        ]
        if spp > 1:
            entries.append((T_PLANARCONFIG, TY_SHORT, [1]))
        return entries

    def close(self):
        self.f.close()


def ome_xml(image_name: str, size_x: int, size_y: int, size_z: int,
            size_c: int, size_t: int, dtype: np.dtype,
            channel_names: Sequence[str], channel_colors: Sequence[int],
            pixel_size_um: float, dz_um: float,
            rgb: bool = False,
            planes: Optional[Sequence[dict]] = None) -> str:
    """Valid OME-XML 2016-06 metadata block.

    ``rgb`` groups the three samples under one Channel with
    SamplesPerPixel=3 (the structure the reference's RGB pyvips path
    carried, stitcher_process.py:1429-1549). ``planes`` adds per-plane
    Plane elements with stage positions — dicts with keys
    the_c/the_z/the_t and optional x_um/y_um/z_um (structure of the
    reference's tifffile/ashlar metadata, stitcher_process.py:1344-1427,
    ashlar_stitcher.py:141-219).
    """
    from xml.sax.saxutils import quoteattr

    def q(text) -> str:
        """Attribute-quote free-form text (names come from filenames —
        '&', '<' or quotes would otherwise break the XML)."""
        return quoteattr(str(text))

    ome_type = {np.dtype('uint8'): 'uint8', np.dtype('uint16'): 'uint16',
                np.dtype('uint32'): 'uint32', np.dtype('int16'): 'int16',
                np.dtype('float32'): 'float'}.get(np.dtype(dtype), 'uint16')
    channels = []
    if rgb:
        name = channel_names[0].rsplit('_', 1)[0] if channel_names else 'RGB'
        channels.append(
            f'<Channel ID="Channel:0:0" Name={q(name)} SamplesPerPixel="3"/>')
    else:
        for i, (name, color) in enumerate(zip(channel_names, channel_colors)):
            r, g, b = (color >> 16) & 0xFF, (color >> 8) & 0xFF, color & 0xFF
            rgba = (r << 24) | (g << 16) | (b << 8) | 0xFF
            if rgba >= 2 ** 31:
                rgba -= 2 ** 32
            channels.append(
                f'<Channel ID="Channel:0:{i}" Name={q(name)} Color="{rgba}" '
                f'SamplesPerPixel="1"/>')
    plane_elems = []
    for p in planes or ():
        attrs = (f'TheC="{p["the_c"]}" TheZ="{p["the_z"]}" '
                 f'TheT="{p["the_t"]}"')
        if 'x_um' in p:
            attrs += (f' PositionX="{p["x_um"]}" PositionXUnit="µm"'
                      f' PositionY="{p["y_um"]}" PositionYUnit="µm"')
        if 'z_um' in p:
            attrs += f' PositionZ="{p["z_um"]}" PositionZUnit="µm"'
        plane_elems.append(f'<Plane {attrs}/>')
    n_pages = size_z * size_t * (1 if rgb else size_c)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://www.openmicroscopy.org/Schemas/OME/2016-06 '
        'http://www.openmicroscopy.org/Schemas/OME/2016-06/ome.xsd">'
        f'<Image ID="Image:0" Name={q(image_name)}>'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="{ome_type}" '
        f'SizeX="{size_x}" SizeY="{size_y}" SizeZ="{size_z}" '
        f'SizeC="{size_c}" SizeT="{size_t}" '
        f'Interleaved="{"true" if rgb else "false"}" '
        f'PhysicalSizeX="{pixel_size_um}" PhysicalSizeXUnit="µm" '
        f'PhysicalSizeY="{pixel_size_um}" PhysicalSizeYUnit="µm" '
        f'PhysicalSizeZ="{dz_um}" PhysicalSizeZUnit="µm">'
        + ''.join(channels)
        + f'<TiffData PlaneCount="{n_pages}"/>'
        + ''.join(plane_elems) +
        '</Pixels></Image></OME>')


def write_ome_tiff_pyramid(path: str, levels: List[np.ndarray],
                           image_name: str, channel_names: Sequence[str],
                           channel_colors: Sequence[int],
                           pixel_size_um: float, dz_um: float,
                           compression: str = 'deflate',
                           thumbnail: bool = True,
                           thumbnail_max: int = 512,
                           rgb: bool = False,
                           position_um: Optional[Sequence[float]] = None) -> str:
    """Write a (C, Z, H, W) multiscale stack as pyramidal OME-TIFF.

    ``levels`` are the pyramid levels, level 0 first, each (C, Z, h, w).
    With ``rgb`` (C must be 3, ordered R/G/B) each page is one
    SamplesPerPixel=3 interleaved plane — the reference's production
    RGB TIFF layout (pyvips path, stitcher_process.py:1429-1549).
    ``position_um`` = (x_um, y_um) stage origin recorded on every
    OME-XML Plane element. A reduced-resolution overview is appended as
    a final page when ``thumbnail`` is set (the layout the reference's
    tifffile writer produced, stitcher_process.py:1344-1427).
    """
    c, z, h, w = levels[0].shape
    if rgb and c != 3:
        raise ValueError(f"rgb output needs exactly 3 channels, got {c}")
    planes = []
    for ci in range(1 if rgb else c):
        for zi in range(z):
            p = {'the_c': ci, 'the_z': zi, 'the_t': 0,
                 'z_um': round(zi * dz_um, 6)}
            if position_um is not None:
                p['x_um'] = round(float(position_um[0]), 6)
                p['y_um'] = round(float(position_um[1]), 6)
            planes.append(p)
    xml = ome_xml(image_name, w, h, z, c, 1, levels[0].dtype,
                  channel_names, channel_colors, pixel_size_um, dz_um,
                  rgb=rgb, planes=planes)
    writer = BigTiffWriter(path, compression=compression)
    first = True
    # Plane order matches DimensionOrder="XYZCT": Z varies fastest, then C.
    for ci in range(1 if rgb else c):
        for zi in range(z):
            if rgb:
                # (h, w, 3) interleaved from the R/G/B channel planes
                plane_levels = [np.ascontiguousarray(
                    np.stack([lv[0, zi], lv[1, zi], lv[2, zi]], axis=-1))
                    for lv in levels]
            else:
                plane_levels = [lv[ci, zi] for lv in levels]
            writer.add_plane(plane_levels, description=xml if first else None)
            first = False
    if thumbnail:
        thumb = levels[-1][:3 if rgb else 1, 0]
        thumb = (np.ascontiguousarray(np.moveaxis(thumb, 0, -1))
                 if rgb else thumb[0])
        while max(thumb.shape[:2]) > thumbnail_max:
            thumb = thumb[::2, ::2]
        writer.add_plane([np.ascontiguousarray(thumb)],
                         description="reduced-resolution overview",
                         subfile_type=1)
    writer.close()
    return path
