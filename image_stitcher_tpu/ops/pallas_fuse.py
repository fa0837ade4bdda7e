"""Pallas TPU kernel for batched tile placement.

The XLA path (ops/fuse.py) expresses fusion as a lax.scan of
dynamic-update-slices; this kernel expresses it directly against the
memory system: tile coordinates ride scalar prefetch (SMEM), each grid
step DMAs an ALIGNED canvas window HBM->VMEM (Mosaic requires window
offsets divisible by the (sublane, lane) tiling), rotates the tile to
its sub-window offset on the VPU, blends under the crop/validity mask,
and DMAs the window back. TPU grid steps execute in order, preserving
the reference's later-tile-wins overwrite semantics exactly
(reference stitcher.py:598's slice-assign, crop rules of
stitcher.py:576-587).

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


def padded_tile_extents(tile_h: int, tile_w: int, dtype) -> Tuple[int, int]:
    """Tile extents rounded up to the Mosaic (sublane, lane) tiling.

    Unaligned cameras (1000^2, 1920x1200, ...) ride the window kernels
    through this padding: the jitted wrappers zero-pad the tile batch to
    these extents and fold the pad into each tile's bottom/right crops,
    so the kernel masks never write pad content — byte-identical to the
    unpadded semantics (fuzz-tested against the XLA scan)."""
    ay = align_y_for(dtype)
    return (-(-tile_h // ay) * ay, -(-tile_w // ALIGN_X) * ALIGN_X)


def pallas_supported(tile_h: int, tile_w: int, dtype) -> bool:
    """Whether the Mosaic window kernels can serve this tile shape.

    Any extent works via padded_tile_extents (the old tw % 128 == 0
    restriction is gone); the remaining limit is VMEM: a row-chunk of
    the padded tile plus its aligned window must fit the scratch budget
    even for the most demanding kernel config (feather + fused
    flatfield). Callers fall back to the XLA scan otherwise."""
    import numpy as np
    th_pad, tw_pad = padded_tile_extents(tile_h, tile_w, dtype)
    try:
        _pick_chunk_rows(th_pad, tw_pad, np.dtype(dtype).itemsize,
                         align_y_for(dtype), win_bytes_per_elem=8,
                         ff_itemsize=4)
    except ValueError:
        return False
    return True


def select_device_kernel(tile_h: int, tile_w: int, dtype,
                         requested: str = 'auto', interpret: bool = False,
                         on_fallback=None) -> str:
    """The one kernel-selection rule for every device fusion backend.

    'pallas' when Mosaic can compile the window kernels for this tile
    shape on this backend (or ``interpret`` forces the interpret-mode
    path for tests), else 'xla'. ``on_fallback`` fires when an explicit
    'pallas' request falls back.
    """
    import jax
    supported = (
        interpret or (jax.default_backend() == 'tpu'
                      and pallas_supported(tile_h, tile_w, dtype)))
    if requested == 'auto':
        return 'pallas' if supported else 'xla'
    if requested == 'pallas' and not supported:
        if on_fallback is not None:
            on_fallback()
        return 'xla'
    return requested


def pallas_padded_canvas_shape(num_c: int, num_z: int, height: int,
                               width: int, tile_h: int, tile_w: int,
                               dtype=None) -> Tuple[int, int, int, int]:
    """Canvas apron for the pallas kernel: one (alignment-padded) tile
    extent plus the alignment margin on bottom/right — sized so the last
    window DMA of a tile placed at the canvas edge stays in bounds even
    when the tile itself is padded up to the Mosaic tiling."""
    import numpy as np
    dt = dtype if dtype is not None else np.uint16
    align_y = align_y_for(dt)
    th_pad, tw_pad = padded_tile_extents(tile_h, tile_w, dt)
    return (num_c, num_z, height + th_pad + align_y,
            width + tw_pad + ALIGN_X)


def _fuse_kernel(th: int, tw: int, align_y: int, chunk_rows: int,
                 n_chunks: int, n_tiles: int, with_ff: bool = False,
                 ff_min: float = 0.0, ff_max: float = 65535.0):
    """Grid = (tiles, row-chunks): each step handles ``chunk_rows`` tile
    rows so VMEM scratch stays bounded for production tile sizes (a
    whole 2048^2 u16 tile + window would blow the ~16 MB VMEM budget).
    Chunks of one tile run consecutively (row-major grid), so the
    later-tile-wins ordering is untouched; each canvas row is written by
    exactly one chunk (the one whose tile rows land there).

    The tile scratch is double-buffered: step s starts the fetch of
    step s+1's chunk before computing, hiding the (read-only) tile DMA
    behind the window round-trip. Window DMAs cannot prefetch across
    steps — consecutive windows may overlap, and later-tile-wins needs
    the previous write-back visible.

    ``with_ff`` fuses the flatfield correction (multiply by the f32
    reciprocal field, clip, truncate — exact ops.fuse.apply_flatfield
    semantics) into the placement pass: the per-channel ff chunk rides
    its own double-buffered DMA, so corrected tiles never round-trip
    through HBM as a separate XLA pass."""
    ALIGN_Y = align_y
    cwh, ww = chunk_rows + ALIGN_Y, tw + ALIGN_X
    total = n_tiles * n_chunks

    def kernel(info_ref, crops_ref, valid_ref, *refs):
        if with_ff:
            (tiles_hbm, ff_hbm, canvas_in, out_ref,
             tile_v, ff_v, win_v, sems) = refs
        else:
            tiles_hbm, canvas_in, out_ref, tile_v, win_v, sems = refs
            ff_hbm = ff_v = None
        # tile_v: (2, chunk_rows, tw) slots; sems: tile slots 0/1,
        # window 2 (+ ff slots 3/4 when with_ff)
        i = pl.program_id(0)
        k = pl.program_id(1)
        step = i * n_chunks + k
        slot = jax.lax.rem(step, 2)
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

        def tile_dma(s, sl):
            return pltpu.make_async_copy(
                tiles_hbm.at[s // n_chunks,
                             pl.ds(jax.lax.rem(s, n_chunks) * chunk_rows,
                                   chunk_rows)],
                tile_v.at[sl], sems.at[sl])

        def ff_dma(s, sl):
            c_s = info_ref[s // n_chunks, 0]
            return pltpu.make_async_copy(
                ff_hbm.at[c_s,
                          pl.ds(jax.lax.rem(s, n_chunks) * chunk_rows,
                                chunk_rows)],
                ff_v.at[sl], sems.at[3 + sl])

        @pl.when(step == 0)
        def _():
            tile_dma(step, slot).start()   # cold start for the first step
            if with_ff:
                ff_dma(step, slot).start()

        win_cp = pltpu.make_async_copy(
            out_ref.at[c, z, pl.ds(yak, cwh), pl.ds(xa, ww)], win_v,
            sems.at[2])
        win_cp.start()

        @pl.when(step + 1 < total)
        def _():
            tile_dma(step + 1, 1 - slot).start()  # prefetch next chunk
            if with_ff:
                ff_dma(step + 1, 1 - slot).start()

        tile_dma(step, slot).wait()
        if with_ff:
            ff_dma(step, slot).wait()
        win_cp.wait()

        chunk = tile_v[slot]
        if with_ff:
            # exact ops.fuse.apply_flatfield semantics: f32 multiply by
            # the reciprocal field (bit-exact, unlike TPU division),
            # clip to the dtype range, truncating cast. Mosaic has no
            # direct 16-bit<->f32 casts; hop through i32 (lossless for
            # u8/u16 content, and the clip bounds the way back).
            corrected = chunk.astype(jnp.int32).astype(jnp.float32) \
                * ff_v[slot]
            chunk = (jnp.clip(corrected, ff_min, ff_max)
                     .astype(jnp.int32).astype(tile_v.dtype))

        # Embed the chunk at (dy, dx) inside the aligned window: pad to
        # window shape, then rotate by the dynamic sub-alignment offset
        # (no wraparound: dy < ALIGN_Y, dx < ALIGN_X by construction).
        # Mosaic's dynamic rotate only handles 32-bit lanes on the
        # sublane dim, so rotate in i32 and cast back.
        padded = jnp.pad(chunk, ((0, ALIGN_Y), (0, ALIGN_X)))
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
            sems.at[2])
        back_cp.start()
        back_cp.wait()

    return kernel


def _pick_chunk_rows(th: int, tw: int, itemsize: int, align_y: int,
                     budget: int = 6 << 20,
                     win_bytes_per_elem: int = 0,
                     ff_itemsize: int = 0) -> int:
    """Largest row-chunk (a divisor of th, multiple of the sublane
    alignment) whose tile+window scratch fits the VMEM budget.

    ``win_bytes_per_elem`` overrides the window scratch cost per element
    (the feather kernel carries TWO f32 windows -> 8); ``ff_itemsize``
    adds a second double-buffered chunk stream (the fused flatfield's
    f32 reciprocal -> 4)."""
    wb = win_bytes_per_elem or itemsize

    def cost(cr):
        # tile scratch is double-buffered (two slots), hence the 2x;
        # same for the optional ff chunk stream
        return (2 * cr * tw * (itemsize + ff_itemsize)
                + (cr + align_y) * (tw + ALIGN_X) * wb)

    if cost(th) <= budget:
        return th
    cr = (th // align_y) * align_y
    while cr >= align_y:
        if th % cr == 0 and cost(cr) <= budget:
            return cr
        cr -= align_y
    # even the minimum aligned chunk overflows the budget (tiles tens of
    # thousands of pixels wide): returning th would just reproduce the
    # already-failed cost(th) as an opaque Mosaic VMEM error at compile
    # time — fail actionably instead
    raise ValueError(
        f"pallas fusion: no row-chunk of a {th}x{tw} "
        f"(itemsize {itemsize}) tile fits the {budget >> 20} MiB VMEM "
        f"budget; pass a larger chunk_budget or use "
        f"EngineOptions.device_fusion_kernel='xla'")


def _feather_kernel(th: int, tw: int, align_y: int, chunk_rows: int,
                    blend_px: int, n_chunks: int, n_tiles: int,
                    with_ff: bool = False, ff_min: float = 0.0,
                    ff_max: float = 65535.0):
    """Feathered accumulate: acc += ramp*tile, wsum += ramp, into aligned
    (acc, wsum) float32 windows. Accumulation is commutative, so chunk
    order is free; ramps are computed in GLOBAL tile coordinates from
    the full crop window, matching ops.fuse._feather_ramp exactly.
    The tile scratch double-buffers across grid steps like the
    overwrite kernel (window pairs cannot: consecutive windows may
    overlap and each step read-modify-writes them).

    ``with_ff`` fuses the flatfield correction; parity note: correction
    quantizes to the storage dtype BEFORE accumulation, exactly like the
    NumPy/XLA feather paths."""
    ALIGN_Y = align_y
    cwh, ww = chunk_rows + ALIGN_Y, tw + ALIGN_X
    total = n_tiles * n_chunks

    def kernel(info_ref, crops_ref, valid_ref, *refs):
        if with_ff:
            (tiles_hbm, ff_hbm, acc_in, wsum_in, acc_ref, wsum_ref,
             tile_v, ff_v, acc_v, wsum_v, sems) = refs
        else:
            (tiles_hbm, acc_in, wsum_in, acc_ref, wsum_ref,
             tile_v, acc_v, wsum_v, sems) = refs
            ff_hbm = ff_v = None
        # tile_v: (2, chunk_rows, tw); sems: tile slots 0/1, acc 2,
        # wsum 3 (+ ff slots 4/5 when with_ff)
        i = pl.program_id(0)
        k = pl.program_id(1)
        step = i * n_chunks + k
        slot = jax.lax.rem(step, 2)
        c = info_ref[i, 0]
        z = info_ref[i, 1]
        y = info_ref[i, 2]
        x = info_ref[i, 3]
        ya = pl.multiple_of((y // ALIGN_Y) * ALIGN_Y, ALIGN_Y)
        xa = pl.multiple_of((x // ALIGN_X) * ALIGN_X, ALIGN_X)
        dy = y - ya
        dx = x - xa
        row0 = k * chunk_rows
        yak = pl.multiple_of(ya + row0, ALIGN_Y)

        def tile_dma(s, sl):
            return pltpu.make_async_copy(
                tiles_hbm.at[s // n_chunks,
                             pl.ds(jax.lax.rem(s, n_chunks) * chunk_rows,
                                   chunk_rows)],
                tile_v.at[sl], sems.at[sl])

        def ff_dma(s, sl):
            c_s = info_ref[s // n_chunks, 0]
            return pltpu.make_async_copy(
                ff_hbm.at[c_s,
                          pl.ds(jax.lax.rem(s, n_chunks) * chunk_rows,
                                chunk_rows)],
                ff_v.at[sl], sems.at[4 + sl])

        @pl.when(step == 0)
        def _():
            tile_dma(step, slot).start()
            if with_ff:
                ff_dma(step, slot).start()

        acc_cp = pltpu.make_async_copy(
            acc_ref.at[c, z, pl.ds(yak, cwh), pl.ds(xa, ww)], acc_v,
            sems.at[2])
        wsum_cp = pltpu.make_async_copy(
            wsum_ref.at[c, z, pl.ds(yak, cwh), pl.ds(xa, ww)], wsum_v,
            sems.at[3])
        acc_cp.start()
        wsum_cp.start()

        @pl.when(step + 1 < total)
        def _():
            tile_dma(step + 1, 1 - slot).start()
            if with_ff:
                ff_dma(step + 1, 1 - slot).start()

        tile_dma(step, slot).wait()
        if with_ff:
            ff_dma(step, slot).wait()
        acc_cp.wait()
        wsum_cp.wait()

        chunk = tile_v[slot]
        if with_ff:
            # correct-clip-quantize to the storage dtype BEFORE the
            # ramp accumulation (apply_flatfield semantics; Mosaic has
            # no 16-bit<->f32 casts, hop through i32)
            corrected = chunk.astype(jnp.int32).astype(jnp.float32) \
                * ff_v[slot]
            chunk = (jnp.clip(corrected, ff_min, ff_max)
                     .astype(jnp.int32).astype(tile_v.dtype))
        padded = jnp.pad(chunk, ((0, ALIGN_Y), (0, ALIGN_X)))
        wide = padded.astype(jnp.int32)
        shifted = pltpu.roll(pltpu.roll(wide, dy, 0), dx, 1)
        content = shifted.astype(jnp.float32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (cwh, ww), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (cwh, ww), 1)
        g = rows - dy + row0          # global tile row per window row
        j = cols - dx                 # global tile col per window col
        top, bottom = crops_ref[i, 0], crops_ref[i, 1]
        left, right = crops_ref[i, 2], crops_ref[i, 3]
        d = jnp.minimum(jnp.minimum(g - top + 1, (th - bottom) - g),
                        jnp.minimum(j - left + 1, (tw - right) - j))
        in_chunk = (rows >= dy) & (rows < dy + chunk_rows)
        live = (d > 0) & in_chunk & (valid_ref[i] != 0)
        ramp = jnp.where(
            live,
            jnp.clip(d.astype(jnp.float32) / float(blend_px), 0.0, 1.0),
            0.0)
        acc_v[:] = acc_v[:] + ramp * content
        wsum_v[:] = wsum_v[:] + ramp

        acc_back = pltpu.make_async_copy(
            acc_v, acc_ref.at[c, z, pl.ds(yak, cwh), pl.ds(xa, ww)],
            sems.at[2])
        wsum_back = pltpu.make_async_copy(
            wsum_v, wsum_ref.at[c, z, pl.ds(yak, cwh), pl.ds(xa, ww)],
            sems.at[3])
        acc_back.start()
        wsum_back.start()
        acc_back.wait()
        wsum_back.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=('blend_px', 'interpret', 'chunk_budget'),
                   donate_argnums=(0, 1))
def fuse_feather_pallas(acc: jnp.ndarray, wsum: jnp.ndarray,
                        tiles: jnp.ndarray, info: jnp.ndarray,
                        crops: jnp.ndarray, valid: jnp.ndarray,
                        ff_recip: jnp.ndarray = None,
                        blend_px: int = 64, interpret: bool = False,
                        chunk_budget: int = 6 << 20):
    """Pallas twin of ops.fuse.fuse_feather (same ramps, same sums).

    acc/wsum: (C, Z, Hp, Wp) float32 padded via
    pallas_padded_canvas_shape computed for the TILE dtype (the stricter
    of the tile/window sublane alignments governs the window origins).

    ``ff_recip`` fuses the flatfield correction (quantized to the tile
    dtype before accumulation, exactly like apply_flatfield-then-
    feather) into the placement pass.
    """
    n, th, tw = tiles.shape
    align_y = align_y_for(tiles.dtype)
    with_ff = ff_recip is not None
    th_pad, tw_pad = padded_tile_extents(th, tw, tiles.dtype)
    if (th_pad, tw_pad) != (th, tw):
        # unaligned camera tiles: zero-pad to the Mosaic tiling and fold
        # the pad into the bottom/right crops — the mask/ramp bounds
        # (th - bottom, tw - right) are then identical to the unpadded
        # tile's, so the pad rows/cols never write or weight anything
        tiles = jnp.pad(tiles, ((0, 0), (0, th_pad - th),
                                (0, tw_pad - tw)))
        if with_ff:
            ff_recip = jnp.pad(ff_recip, ((0, 0), (0, th_pad - th),
                                          (0, tw_pad - tw)))
        crops = crops + jnp.array([0, th_pad - th, 0, tw_pad - tw],
                                  crops.dtype)
        th, tw = th_pad, tw_pad
    chunk_rows = _pick_chunk_rows(th, tw, tiles.dtype.itemsize, align_y,
                                  budget=chunk_budget, win_bytes_per_elem=8,
                                  ff_itemsize=4 if with_ff else 0)
    n_chunks = -(-th // chunk_rows)
    import numpy as np
    if np.issubdtype(np.dtype(tiles.dtype), np.integer):
        ii = np.iinfo(np.dtype(tiles.dtype))
        ff_min, ff_max = float(ii.min), float(ii.max)
    else:
        ff_min, ff_max = float('-inf'), float('inf')
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]      # tiles (HBM)
    if with_ff:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # ff (HBM)
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),   # acc (HBM, aliased)
        pl.BlockSpec(memory_space=pl.ANY),   # wsum (HBM, aliased)
    ]
    scratch = [pltpu.VMEM((2, chunk_rows, tw), tiles.dtype)]
    if with_ff:
        scratch.append(pltpu.VMEM((2, chunk_rows, tw), jnp.float32))
    scratch += [
        pltpu.VMEM((chunk_rows + align_y, tw + ALIGN_X), jnp.float32),
        pltpu.VMEM((chunk_rows + align_y, tw + ALIGN_X), jnp.float32),
        pltpu.SemaphoreType.DMA((6 if with_ff else 4,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, n_chunks),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=scratch,
    )
    operands = [info, crops, valid.astype(jnp.int32), tiles]
    if with_ff:
        operands.append(ff_recip)
    operands += [acc, wsum]
    na = len(operands)
    return pl.pallas_call(
        _feather_kernel(th, tw, align_y, chunk_rows, blend_px, n_chunks, n,
                        with_ff=with_ff, ff_min=ff_min, ff_max=ff_max),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(acc.shape, jnp.float32),
                   jax.ShapeDtypeStruct(wsum.shape, jnp.float32)),
        input_output_aliases={na - 2: 0, na - 1: 1},  # acc, wsum -> outputs
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=('interpret', 'chunk_budget'),
                   donate_argnums=(0,))
def fuse_overwrite_pallas(canvas: jnp.ndarray, tiles: jnp.ndarray,
                          info: jnp.ndarray, crops: jnp.ndarray,
                          valid: jnp.ndarray,
                          ff_recip: jnp.ndarray = None,
                          interpret: bool = False,
                          chunk_budget: int = 6 << 20) -> jnp.ndarray:
    """Pallas twin of ops.fuse.fuse_overwrite (same semantics).

    canvas: (C, Z, Hp, Wp) padded via pallas_padded_canvas_shape;
    tiles: (N, th, tw); info: (N, 4) int32 [c, z, y, x]; crops: (N, 4)
    int32; valid: (N,) bool.

    ``ff_recip`` ((C, th, tw) f32 reciprocal flatfields) fuses the
    correction into the placement pass — byte-identical to
    apply_flatfield-then-place, without the intermediate HBM round-trip.
    """
    n, th, tw = tiles.shape
    align_y = align_y_for(canvas.dtype)
    with_ff = ff_recip is not None
    th_pad, tw_pad = padded_tile_extents(th, tw, canvas.dtype)
    if (th_pad, tw_pad) != (th, tw):
        # see fuse_feather_pallas: pad to the Mosaic tiling, fold the
        # pad into bottom/right crops so masks exclude it exactly
        tiles = jnp.pad(tiles, ((0, 0), (0, th_pad - th),
                                (0, tw_pad - tw)))
        if with_ff:
            ff_recip = jnp.pad(ff_recip, ((0, 0), (0, th_pad - th),
                                          (0, tw_pad - tw)))
        crops = crops + jnp.array([0, th_pad - th, 0, tw_pad - tw],
                                  crops.dtype)
        th, tw = th_pad, tw_pad
    chunk_rows = _pick_chunk_rows(th, tw, tiles.dtype.itemsize, align_y,
                                  budget=chunk_budget,
                                  ff_itemsize=4 if with_ff else 0)
    n_chunks = -(-th // chunk_rows)
    import numpy as np
    # apply_flatfield clips to the STORAGE dtype's full range (tiles
    # and canvas share it on every pipeline path)
    if np.issubdtype(np.dtype(tiles.dtype), np.integer):
        ii = np.iinfo(np.dtype(tiles.dtype))
        ff_min, ff_max = float(ii.min), float(ii.max)
    else:
        ff_min, ff_max = float('-inf'), float('inf')
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]      # tiles (HBM)
    if with_ff:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # ff (HBM)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # canvas (aliased)
    scratch = [pltpu.VMEM((2, chunk_rows, tw), tiles.dtype)]
    if with_ff:
        scratch.append(pltpu.VMEM((2, chunk_rows, tw), jnp.float32))
    scratch += [
        pltpu.VMEM((chunk_rows + align_y, tw + ALIGN_X), canvas.dtype),
        pltpu.SemaphoreType.DMA((5 if with_ff else 3,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    operands = [info, crops, valid.astype(jnp.int32), tiles]
    if with_ff:
        operands.append(ff_recip)
    operands.append(canvas)
    return pl.pallas_call(
        _fuse_kernel(th, tw, align_y, chunk_rows, n_chunks, n,
                     with_ff=with_ff, ff_min=ff_min, ff_max=ff_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        input_output_aliases={len(operands) - 1: 0},  # canvas -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)
