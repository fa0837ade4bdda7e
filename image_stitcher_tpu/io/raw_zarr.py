"""Direct chunk-file writer for raw (uncompressed) zarr v2 arrays.

The streaming fusers emit full-width band slabs. For compressor-null
arrays a chunk body is just a C-order byte slab, so each chunk file can
be written straight from the band buffer with ``pwritev`` — one strided
iovec per row — skipping tensorstore's per-chunk assembly copy and
write machinery, which measures ~0.4 GB/s of single-core CPU on this
path versus ~1.5-2.5 GB/s for the direct write. On the one-core hosts
this framework targets (reference context: save dominates, see
/root/reference/save_region_test.py:126-179) that is the difference
between the writer being the wall and the writer keeping up.

Parity contract (tested in tests/test_raw_zarr.py): chunk files are
byte-identical to what tensorstore writes for the same data — full-size
bodies, edge chunks zero-padded, nested ``t/c/z/cy/cx`` keys for
dimension_separator '/'. Rows a band never touches stay sparse file
zeros, which read identically to written fill-value zeros (fill must be
0; anything else falls back to tensorstore).

This writer only covers the slab patterns the fusers produce (single
(t, c, z) planes, x starting at 0, C-contiguous rows). ``try_write``
returns False for anything else and the caller falls back to the
tensorstore path, so it is an accelerator, not a second code path to
keep correct by hand.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..native import get_lib


class RawV2SlabWriter:
    """Writes band slabs into one raw zarr v2 array's chunk files."""

    def __init__(self, path: str, shape: Sequence[int],
                 chunks: Sequence[int], dtype,
                 dimension_separator: str = '/', fill_value=0):
        self.path = path
        self.shape = tuple(int(s) for s in shape)
        # mirror create_zarr_array's clamp so the grid matches .zarray
        self.chunks = tuple(min(int(c), int(s)) if s > 0 else int(c)
                            for c, s in zip(chunks, self.shape))
        self.dtype = np.dtype(dtype)
        self.sep = dimension_separator
        self.ok = (fill_value == 0 and self.sep in ('/', '.')
                   and len(self.shape) == 5 and get_lib() is not None
                   and hasattr(get_lib(), 'write_rows_contig'))
        cy, cx = self.chunks[3], self.chunks[4]
        self.pitch = cx * self.dtype.itemsize
        self.chunk_bytes = cy * self.pitch
        self._pad = ctypes.create_string_buffer(self.pitch)
        self._made_dirs = set()

    # ------------------------------------------------------------------

    def _chunk_file(self, t: int, c: int, z: int, cyi: int, cxi: int) -> str:
        key = (str(t), str(c), str(z), str(cyi), str(cxi))
        if self.sep == '/':
            d = os.path.join(self.path, *key[:-1])
            if d not in self._made_dirs:
                os.makedirs(d, exist_ok=True)
                self._made_dirs.add(d)
            return os.path.join(d, key[-1])
        return os.path.join(self.path, '.'.join(key))

    def _write_plane_slab(self, t: int, c: int, z: int, y0: int,
                          plane: np.ndarray) -> None:
        """Write plane (h, w) at rows [y0, y0+h), cols [0, w)."""
        lib = get_lib()
        cy, cx = self.chunks[3], self.chunks[4]
        itemsize = self.dtype.itemsize
        h, w = plane.shape
        y1 = y0 + h
        row_stride = plane.strides[0]
        base = plane.ctypes.data
        for cyi in range(y0 // cy, (y1 - 1) // cy + 1):
            ry0, ry1 = max(y0, cyi * cy), min(y1, (cyi + 1) * cy)
            nrows = ry1 - ry0
            full_y = (ry0 == cyi * cy and nrows == cy)
            off0 = (ry0 - cyi * cy) * self.pitch
            for cxi in range((w - 1) // cx + 1):
                x0, x1 = cxi * cx, min(w, (cxi + 1) * cx)
                row_bytes = (x1 - x0) * itemsize
                pad_bytes = self.pitch - row_bytes
                fpath = self._chunk_file(t, c, z, cyi, cxi)
                fd = os.open(fpath, os.O_WRONLY | os.O_CREAT, 0o644)
                try:
                    if not full_y and os.fstat(fd).st_size < self.chunk_bytes:
                        # sparse-extend: untouched rows read as fill zeros
                        os.ftruncate(fd, self.chunk_bytes)
                    rc = lib.write_rows_contig(
                        fd, ctypes.c_void_p(base + (ry0 - y0) * row_stride
                                            + x0 * itemsize),
                        row_stride, nrows, row_bytes,
                        ctypes.cast(self._pad, ctypes.c_void_p)
                        if pad_bytes else None,
                        pad_bytes, off0)
                    if rc < 0:
                        raise OSError(int(-rc), os.strerror(int(-rc)), fpath)
                finally:
                    os.close(fd)

    # ------------------------------------------------------------------

    def try_write(self, sel: Optional[Tuple], data: np.ndarray) -> bool:
        """Write a 5D slab if this writer supports its layout.

        Returns True when handled; False means the caller must route the
        write through tensorstore instead (unsupported pattern — never a
        partial write).
        """
        if not self.ok:
            return False
        data = np.asarray(data)
        if data.dtype != self.dtype or data.ndim != 5:
            return False
        if sel is None:
            sel = tuple(slice(0, s) for s in self.shape)
        try:
            idx = [(int(s.start or 0), int(s.stop)) for s in sel]
        except (AttributeError, TypeError):
            return False
        if any((b - a) != n for (a, b), n in zip(idx, data.shape)):
            return False
        # x must start at column 0 (zero-padding the tail of each
        # touched chunk is only correct when nothing sits to the left)
        if idx[4][0] != 0 or idx[4][1] > self.shape[4]:
            return False
        if data.strides[4] != self.dtype.itemsize:
            return False
        for it in range(data.shape[0]):
            for ic in range(data.shape[1]):
                for iz in range(data.shape[2]):
                    plane = data[it, ic, iz]
                    if plane.shape[0] == 0 or plane.shape[1] == 0:
                        continue
                    self._write_plane_slab(
                        idx[0][0] + it, idx[1][0] + ic, idx[2][0] + iz,
                        idx[3][0], plane)
        return True
