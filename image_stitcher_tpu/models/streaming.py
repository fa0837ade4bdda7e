"""Streaming fusion: tiles -> zarr store with bounded memory.

The reference's zarr_stitcher never materializes the canvas — workers
write FOVs straight into the store (zarr_stitcher.py:421-489) and the
pyramid is built level-from-level in z-blocks (:614-664). This module is
that architecture done band-wise: each (channel, z) plane is fused in
horizontal bands sized to the chunk grid; a finished band is written to
level 0 and immediately downsampled into every pyramid level (band rows
are a multiple of 2^(levels-1), so pooling windows never cross bands).
Peak memory = bands-in-flight x band bytes, independent of canvas size.

Tiles spanning a band boundary are re-read per band (reads are cheap via
the fast TIFF path); within a band, jobs apply in global plan order, so
overwrite semantics match the in-RAM paths exactly (tested).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io.omezarr import MultiscaleWriter
from ..ops.host_fuse import correct_tile, host_downsample


def band_rows_for(chunk_rows: int, num_levels: int) -> int:
    """Band height: >= one chunk row, multiple of 2^(num_levels-1)."""
    align = 1 << max(0, num_levels - 1)
    return max(chunk_rows, ((chunk_rows + align - 1) // align) * align)


class StreamingFuser:
    """Fuse per-plane bands and stream them into a MultiscaleWriter."""

    def __init__(self, writer: MultiscaleWriter, num_c: int, num_z: int,
                 height: int, width: int, tile_h: int, tile_w: int, dtype,
                 num_levels: int, downsample_mode: str = 'nearest',
                 chunk_rows: int = 2048, num_threads: int = 2,
                 flatfields: Optional[np.ndarray] = None,
                 blend_method: str = 'overwrite', blend_px: int = 64):
        self.writer = writer
        self.num_c, self.num_z = num_c, num_z
        self.height, self.width = height, width
        self.tile_h, self.tile_w = tile_h, tile_w
        self.dtype = np.dtype(dtype)
        self.num_levels = num_levels
        self.mode = downsample_mode
        self.band = band_rows_for(chunk_rows, num_levels)
        self.num_threads = num_threads
        self.flatfields = flatfields
        self.blend = blend_method
        self.blend_px = blend_px

    # ------------------------------------------------------------------

    def _correct(self, tile: np.ndarray, c: int) -> np.ndarray:
        return correct_tile(tile, self.flatfields, c, self.dtype)

    def _place_in_band(self, buf: np.ndarray, band0: int, job,
                       tile: np.ndarray) -> None:
        top, bottom, left, right = job.crops
        th, tw = tile.shape
        y0, y1 = top, th - bottom if bottom else th
        x0, x1 = left, tw - right if right else tw
        yy, xx = job.y + top, job.x + left
        # clamp to canvas
        y1 = min(y1, y0 + (self.height - yy))
        x1 = min(x1, x0 + (self.width - xx))
        # clamp to band rows [band0, band0+buf rows)
        n_rows = buf[0].shape[0] if isinstance(buf, tuple) else buf.shape[0]
        b_lo, b_hi = band0, band0 + n_rows
        if yy < b_lo:
            y0 += b_lo - yy
            yy = b_lo
        y1 = min(y1, y0 + (b_hi - yy))
        if y1 <= y0 or x1 <= x0:
            return
        t = self._correct(tile, job.channel_idx)[y0:y1, x0:x1]
        if self.blend == 'feather':
            # Feather weights are distances from the tile's FULL cropped
            # window edges (identical to the in-RAM paths), evaluated on
            # this band's slice of the window.
            acc, wsum = buf
            top, bottom, left, right = job.crops
            wy0 = job.y + top
            wy1 = job.y + (self.tile_h - bottom if bottom else self.tile_h)
            wx0 = job.x + left
            wx1 = job.x + (self.tile_w - right if right else self.tile_w)
            gy = np.arange(yy, yy + t.shape[0])
            gx = np.arange(xx, xx + t.shape[1])
            dy = np.minimum(gy - wy0 + 1, wy1 - gy)
            dx = np.minimum(gx - wx0 + 1, wx1 - gx)
            wgt = (np.minimum.outer(dy, dx).astype(np.float32)
                   / self.blend_px).clip(0, 1)
            acc[yy - band0:yy - band0 + t.shape[0],
                xx:xx + t.shape[1]] += wgt * t.astype(np.float32)
            wsum[yy - band0:yy - band0 + t.shape[0],
                 xx:xx + t.shape[1]] += wgt
        else:
            buf[yy - band0:yy - band0 + t.shape[0], xx:xx + t.shape[1]] = t

    def _process_band(self, c: int, z: int, band0: int,
                      jobs: Sequence, load_fn: Callable,
                      progress_cb=None) -> None:
        rows = min(self.band, self.height - band0)
        if self.blend == 'feather':
            buf = (np.zeros((rows, self.width), np.float32),
                   np.zeros((rows, self.width), np.float32))
        else:
            buf = np.zeros((rows, self.width), self.dtype)
        for job, is_primary in jobs:
            self._place_in_band(buf, band0, job, load_fn(job))
            if progress_cb is not None and is_primary:
                progress_cb()
        if self.blend == 'feather':
            acc, wsum = buf
            out = acc / np.maximum(wsum, 1e-6)
            out[wsum == 0] = 0
            if np.issubdtype(self.dtype, np.integer):
                info = np.iinfo(self.dtype)
                out = np.clip(np.round(out), info.min, info.max)
            buf = out.astype(self.dtype)
        # level 0 slab
        sel0 = (slice(0, 1), slice(c, c + 1), slice(z, z + 1),
                slice(band0, band0 + rows), slice(0, self.width))
        self.writer.write_level(0, buf[None, None, None], sel=sel0)
        # pyramid slabs: band rows align with every level's pooling grid
        level = buf
        for lv in range(1, self.num_levels):
            level = host_downsample(level, self.mode)
            b_lv = band0 >> lv
            h_lv, w_lv = level.shape
            if h_lv == 0 or w_lv == 0:
                break
            sel = (slice(0, 1), slice(c, c + 1), slice(z, z + 1),
                   slice(b_lv, b_lv + h_lv), slice(0, w_lv))
            self.writer.write_level(lv, level[None, None, None], sel=sel)

    # ------------------------------------------------------------------

    def run(self, jobs: Sequence, load_fn: Callable,
            progress_cb: Optional[Callable[[int], None]] = None,
            stop_check: Optional[Callable] = None) -> None:
        """Fuse all jobs (TileJob-likes) through band tasks."""
        # Partition jobs by (plane, band); preserve plan order per band.
        tasks: Dict[Tuple[int, int, int], List] = {}
        n_jobs = 0
        for job in jobs:
            top, bottom = job.crops[0], job.crops[1]
            y0e = job.y + top
            y1e = min(job.y + self.tile_h - bottom, self.height)
            if y1e <= y0e:
                continue
            n_jobs += 1
            first = True
            for b in range(y0e // self.band, (y1e - 1) // self.band + 1):
                tasks.setdefault((job.channel_idx, job.z_level,
                                  b * self.band), []).append((job, first))
                first = False  # progress counts each job exactly once

        import threading
        done = [0]
        done_lock = threading.Lock()

        def progress():
            with done_lock:
                done[0] += 1
                n = done[0]
            if progress_cb is not None:
                progress_cb(n, n_jobs)

        cancelled = [False]

        def run_task(key):
            if cancelled[0]:
                return
            if stop_check is not None:
                stop_check()
            c, z, band0 = key
            self._process_band(c, z, band0, tasks[key], load_fn, progress)

        pool = ThreadPoolExecutor(self.num_threads)
        try:
            list(pool.map(run_task, sorted(tasks.keys())))
        except BaseException:
            cancelled[0] = True
            pool.shutdown(wait=False, cancel_futures=True)
            raise
        finally:
            pool.shutdown(wait=True)
        self.writer.close()
