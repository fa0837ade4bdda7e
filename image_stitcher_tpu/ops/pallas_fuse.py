"""Pallas TPU kernel for batched tile placement.

The XLA path (ops/fuse.py) expresses fusion as a lax.scan of
dynamic-update-slices; this kernel expresses it directly against the
memory system: tile coordinates ride scalar prefetch (SMEM), each grid
step DMAs an ALIGNED canvas window HBM->VMEM (Mosaic requires window
offsets divisible by the (sublane, lane) tiling), rotates the tile to
its sub-window offset on the VPU, blends under the crop/validity mask,
and DMAs the window back. TPU grid steps execute in order, preserving
the reference's later-tile-wins overwrite semantics exactly.

Used on the device fusion path when EngineOptions.device_fusion_kernel
== 'pallas'; always testable off-TPU via interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN_X = 128  # lane alignment


def align_y_for(dtype) -> int:
    """Sublane alignment: Mosaic packs (8,128) tiles of 32-bit lanes,
    so the row granularity is 8 * (4 // itemsize)."""
    import numpy as np
    itemsize = np.dtype(dtype).itemsize
    return 8 * max(1, 4 // itemsize)


def pallas_padded_canvas_shape(num_c: int, num_z: int, height: int,
                               width: int, tile_h: int, tile_w: int,
                               dtype=None) -> Tuple[int, int, int, int]:
    """Canvas apron for the pallas kernel: one tile extent plus the
    alignment margin on bottom/right."""
    import numpy as np
    align_y = align_y_for(dtype if dtype is not None else np.uint16)
    return (num_c, num_z, height + tile_h + align_y,
            width + tile_w + ALIGN_X)


def _fuse_kernel(th: int, tw: int, align_y: int, chunk_rows: int):
    """Grid = (tiles, row-chunks): each step handles ``chunk_rows`` tile
    rows so VMEM scratch stays bounded for production tile sizes (a
    whole 2048^2 u16 tile + window would blow the ~16 MB VMEM budget).
    Chunks of one tile run consecutively (row-major grid), so the
    later-tile-wins ordering is untouched; each canvas row is written by
    exactly one chunk (the one whose tile rows land there)."""
    ALIGN_Y = align_y
    cwh, ww = chunk_rows + ALIGN_Y, tw + ALIGN_X

    def kernel(info_ref, crops_ref, valid_ref, tiles_hbm, canvas_in,
               out_ref, tile_v, win_v, sems):
        i = pl.program_id(0)
        k = pl.program_id(1)
        c = info_ref[i, 0]
        z = info_ref[i, 1]
        y = info_ref[i, 2]
        x = info_ref[i, 3]
        ya = pl.multiple_of((y // ALIGN_Y) * ALIGN_Y, ALIGN_Y)
        xa = pl.multiple_of((x // ALIGN_X) * ALIGN_X, ALIGN_X)
        dy = y - ya
        dx = x - xa
        row0 = k * chunk_rows  # first tile row of this chunk
        yak = pl.multiple_of(ya + row0, ALIGN_Y)

        tile_cp = pltpu.make_async_copy(
            tiles_hbm.at[i, pl.ds(row0, chunk_rows)], tile_v, sems.at[0])
        win_cp = pltpu.make_async_copy(
            out_ref.at[c, z, pl.ds(yak, cwh), pl.ds(xa, ww)], win_v,
            sems.at[1])
        tile_cp.start()
        win_cp.start()
        tile_cp.wait()
        win_cp.wait()

        # Embed the chunk at (dy, dx) inside the aligned window: pad to
        # window shape, then rotate by the dynamic sub-alignment offset
        # (no wraparound: dy < ALIGN_Y, dx < ALIGN_X by construction).
        # Mosaic's dynamic rotate only handles 32-bit lanes on the
        # sublane dim, so rotate in i32 and cast back.
        padded = jnp.pad(tile_v[:], ((0, ALIGN_Y), (0, ALIGN_X)))
        wide = padded.astype(jnp.int32)
        shifted = pltpu.roll(pltpu.roll(wide, dy, 0), dx, 1)
        shifted = shifted.astype(tile_v.dtype)

        rows = jax.lax.broadcasted_iota(jnp.int32, (cwh, ww), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (cwh, ww), 1)
        g = rows - dy + row0  # global tile row at each window row
        mask = ((rows >= dy) & (rows < dy + chunk_rows)  # this chunk's rows
                & (g >= crops_ref[i, 0])
                & (g < th - crops_ref[i, 1])
                & (cols >= dx + crops_ref[i, 2])
                & (cols < dx + tw - crops_ref[i, 3])
                & (valid_ref[i] != 0))
        win_v[:] = jnp.where(mask, shifted, win_v[:])

        back_cp = pltpu.make_async_copy(
            win_v, out_ref.at[c, z, pl.ds(yak, cwh), pl.ds(xa, ww)],
            sems.at[1])
        back_cp.start()
        back_cp.wait()

    return kernel


def _pick_chunk_rows(th: int, tw: int, itemsize: int, align_y: int,
                     budget: int = 6 << 20) -> int:
    """Largest row-chunk (a divisor of th, multiple of the sublane
    alignment) whose tile+window scratch fits the VMEM budget."""
    def cost(cr):
        return (cr * tw + (cr + align_y) * (tw + ALIGN_X)) * itemsize

    if cost(th) <= budget:
        return th
    cr = (th // align_y) * align_y
    while cr >= align_y:
        if th % cr == 0 and cost(cr) <= budget:
            return cr
        cr -= align_y
    return th  # no aligned divisor fits; single-chunk fallback


@functools.partial(jax.jit, static_argnames=('interpret', 'chunk_budget'),
                   donate_argnums=(0,))
def fuse_overwrite_pallas(canvas: jnp.ndarray, tiles: jnp.ndarray,
                          info: jnp.ndarray, crops: jnp.ndarray,
                          valid: jnp.ndarray,
                          interpret: bool = False,
                          chunk_budget: int = 6 << 20) -> jnp.ndarray:
    """Pallas twin of ops.fuse.fuse_overwrite (same semantics).

    canvas: (C, Z, Hp, Wp) padded via pallas_padded_canvas_shape;
    tiles: (N, th, tw); info: (N, 4) int32 [c, z, y, x]; crops: (N, 4)
    int32; valid: (N,) bool.
    """
    n, th, tw = tiles.shape
    align_y = align_y_for(canvas.dtype)
    chunk_rows = _pick_chunk_rows(th, tw, tiles.dtype.itemsize, align_y,
                                  budget=chunk_budget)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, -(-th // chunk_rows)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # tiles (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # canvas (HBM, aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((chunk_rows, tw), tiles.dtype),
            pltpu.VMEM((chunk_rows + align_y, tw + ALIGN_X), canvas.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _fuse_kernel(th, tw, align_y, chunk_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        input_output_aliases={4: 0},  # canvas operand -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(info, crops, valid.astype(jnp.int32), tiles, canvas)
