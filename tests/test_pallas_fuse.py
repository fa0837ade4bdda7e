"""Pallas fusion kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from image_stitcher_tpu.ops.fuse import fuse_overwrite, padded_canvas_shape
from image_stitcher_tpu.ops.pallas_fuse import (fuse_overwrite_pallas,
                                                pallas_padded_canvas_shape)


def _problem(rng, n=12, C=2, Z=1, H=96, W=80, th=32, tw=32):
    tiles = rng.integers(0, 65535, (n, th, tw), dtype=np.uint16)
    info = np.stack([
        rng.integers(0, C, n), rng.integers(0, Z, n),
        rng.integers(0, H, n), rng.integers(0, W, n)], axis=1).astype(np.int32)
    crops = rng.integers(0, 6, (n, 4)).astype(np.int32)
    valid = rng.random(n) > 0.2
    return tiles, info, crops, valid


def test_pallas_matches_xla(rng):
    C, Z, H, W, th, tw = 2, 1, 96, 80, 32, 32
    tiles, info, crops, valid = _problem(rng, C=C, Z=Z, H=H, W=W, th=th, tw=tw)
    cv0 = jnp.zeros(padded_canvas_shape(C, Z, H, W, th, tw), jnp.uint16)
    expect = np.asarray(fuse_overwrite(
        cv0, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid)))[:, :, :H, :W]
    cv1 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, th, tw), jnp.uint16)
    got = np.asarray(fuse_overwrite_pallas(
        cv1, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid),
        interpret=True))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


def test_pallas_chunked_matches_xla(rng):
    """Row-chunked kernel path (VMEM-bounded scratch, the production
    2048^2 regime): a tiny chunk budget forces multiple row chunks per
    tile; output must stay byte-equal to the XLA scan."""
    from image_stitcher_tpu.ops.pallas_fuse import (_pick_chunk_rows,
                                                    align_y_for)
    C, Z, H, W, th, tw = 2, 1, 160, 144, 64, 64
    budget = 30_000  # forces chunk_rows < th
    assert _pick_chunk_rows(th, tw, 2, align_y_for(np.uint16),
                            budget=budget) < th
    tiles, info, crops, valid = _problem(rng, C=C, Z=Z, H=H, W=W, th=th, tw=tw)
    cv0 = jnp.zeros(padded_canvas_shape(C, Z, H, W, th, tw), jnp.uint16)
    expect = np.asarray(fuse_overwrite(
        cv0, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid)))[:, :, :H, :W]
    cv1 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, th, tw), jnp.uint16)
    got = np.asarray(fuse_overwrite_pallas(
        cv1, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid),
        interpret=True, chunk_budget=budget))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


def test_pallas_feather_matches_xla(rng):
    """The pallas feather kernel accumulates the same (acc, wsum) as
    ops.fuse.fuse_feather — identical ramps from the full crop window,
    including with chunking forced."""
    from image_stitcher_tpu.ops.fuse import finalize_feather, fuse_feather
    from image_stitcher_tpu.ops.pallas_fuse import fuse_feather_pallas
    C, Z, H, W, th, tw = 2, 1, 128, 112, 32, 32
    tiles, info, crops, valid = _problem(rng, n=14, C=C, Z=Z, H=H, W=W,
                                         th=th, tw=tw)
    shp = padded_canvas_shape(C, Z, H, W, th, tw)
    acc0 = jnp.zeros(shp, jnp.float32)
    w0 = jnp.zeros(shp, jnp.float32)
    acc_x, w_x = fuse_feather(acc0, w0, jnp.asarray(tiles), jnp.asarray(info),
                              jnp.asarray(crops), jnp.asarray(valid),
                              blend_px=12)
    expect = np.asarray(finalize_feather(acc_x, w_x, jnp.uint16))[:, :, :H, :W]

    # 80_000 admits only the 16-row chunk of the lane-padded 32x128
    # tile (cost(16)=73,728, cost(32)=114,688) so chunking is genuinely
    # forced — budgets are calibrated against padded_tile_extents now
    for budget in (6 << 20, 80_000):  # single-chunk and forced-chunk
        pshp = pallas_padded_canvas_shape(C, Z, H, W, th, tw, np.uint16)
        acc_p, w_p = fuse_feather_pallas(
            jnp.zeros(pshp, jnp.float32), jnp.zeros(pshp, jnp.float32),
            jnp.asarray(tiles), jnp.asarray(info), jnp.asarray(crops),
            jnp.asarray(valid), blend_px=12, interpret=True,
            chunk_budget=budget)
        got = np.asarray(finalize_feather(acc_p, w_p,
                                          jnp.uint16))[:, :, :H, :W]
        np.testing.assert_array_equal(got, expect)


def test_pallas_overwrite_order(rng):
    """Overlapping tiles: later grid step must win."""
    th = tw = 16
    shape = pallas_padded_canvas_shape(1, 1, 32, 32, th, tw)
    t1 = np.full((th, tw), 7, np.uint16)
    t2 = np.full((th, tw), 9, np.uint16)
    got = fuse_overwrite_pallas(
        jnp.zeros(shape, jnp.uint16),
        jnp.asarray(np.stack([t1, t2])),
        jnp.asarray([[0, 0, 0, 0], [0, 0, 4, 4]], jnp.int32),
        jnp.zeros((2, 4), jnp.int32),
        jnp.asarray([True, True]), interpret=True)
    out = np.asarray(got)[:, :, :32, :32]
    assert out[0, 0, 8, 8] == 9
    assert out[0, 0, 0, 0] == 7


@pytest.mark.parametrize("budget", [6 << 20, 80_000])
def test_pallas_fused_flatfield_matches_xla(rng, budget):
    """ff_recip fused into the placement kernel must be byte-identical
    to apply_flatfield -> fuse_overwrite (both chunked and unchunked)."""
    from image_stitcher_tpu.ops.fuse import apply_flatfield
    C, Z, H, W, th, tw = 2, 1, 160, 144, 64, 64
    tiles, info, crops, valid = _problem(rng, C=C, Z=Z, H=H, W=W,
                                         th=th, tw=tw)
    ff = (rng.random((C, th, tw)) * 0.8 + 0.6).astype(np.float32)
    corrected = apply_flatfield(jnp.asarray(tiles), jnp.asarray(ff),
                                jnp.asarray(info[:, 0]), jnp.uint16)
    cv0 = jnp.zeros(padded_canvas_shape(C, Z, H, W, th, tw), jnp.uint16)
    expect = np.asarray(fuse_overwrite(
        cv0, corrected, jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid)))[:, :, :H, :W]
    cv1 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, th, tw),
                    jnp.uint16)
    got = np.asarray(fuse_overwrite_pallas(
        cv1, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid), ff_recip=jnp.asarray(ff),
        interpret=True, chunk_budget=budget))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("budget", [6 << 20, 100_000])
def test_pallas_feather_fused_flatfield_matches_xla(rng, budget):
    """Feather with ff_recip fused must equal apply_flatfield ->
    fuse_feather (the correction quantizes to dtype before the ramps)."""
    from image_stitcher_tpu.ops.fuse import (apply_flatfield,
                                             finalize_feather, fuse_feather)
    from image_stitcher_tpu.ops.pallas_fuse import fuse_feather_pallas
    C, Z, H, W, th, tw = 2, 1, 128, 112, 32, 32
    tiles, info, crops, valid = _problem(rng, n=14, C=C, Z=Z, H=H, W=W,
                                         th=th, tw=tw)
    ff = (rng.random((C, th, tw)) * 0.8 + 0.6).astype(np.float32)
    corrected = apply_flatfield(jnp.asarray(tiles), jnp.asarray(ff),
                                jnp.asarray(info[:, 0]), jnp.uint16)
    shp = padded_canvas_shape(C, Z, H, W, th, tw)
    acc_x, w_x = fuse_feather(jnp.zeros(shp, jnp.float32),
                              jnp.zeros(shp, jnp.float32),
                              corrected, jnp.asarray(info),
                              jnp.asarray(crops), jnp.asarray(valid),
                              blend_px=12)
    expect = np.asarray(finalize_feather(acc_x, w_x,
                                         jnp.uint16))[:, :, :H, :W]
    pshp = pallas_padded_canvas_shape(C, Z, H, W, th, tw, np.uint16)
    acc_p, w_p = fuse_feather_pallas(
        jnp.zeros(pshp, jnp.float32), jnp.zeros(pshp, jnp.float32),
        jnp.asarray(tiles), jnp.asarray(info), jnp.asarray(crops),
        jnp.asarray(valid), ff_recip=jnp.asarray(ff), blend_px=12,
        interpret=True, chunk_budget=budget)
    got = np.asarray(finalize_feather(acc_p, w_p, jnp.uint16))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


def test_pallas_fused_flatfield_signed_dtype(rng):
    """int16 tiles: the fused correction must clip to the dtype's FULL
    range (negatives survive), matching apply_flatfield exactly."""
    from image_stitcher_tpu.ops.fuse import apply_flatfield
    C, Z, H, W, th, tw = 1, 1, 96, 96, 32, 32
    n = 6
    tiles = rng.integers(-30000, 30000, (n, th, tw)).astype(np.int16)
    info = np.stack([np.zeros(n, int), np.zeros(n, int),
                     rng.integers(0, H, n), rng.integers(0, W, n)],
                    axis=1).astype(np.int32)
    crops = np.zeros((n, 4), np.int32)
    valid = np.ones((n,), bool)
    ff = (rng.random((C, th, tw)) * 0.8 + 0.6).astype(np.float32)
    corrected = apply_flatfield(jnp.asarray(tiles), jnp.asarray(ff),
                                jnp.asarray(info[:, 0]), jnp.int16)
    cv0 = jnp.zeros(padded_canvas_shape(C, Z, H, W, th, tw), jnp.int16)
    expect = np.asarray(fuse_overwrite(
        cv0, corrected, jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid)))[:, :, :H, :W]
    assert expect.min() < 0  # negatives must be exercised
    cv1 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, th, tw,
                                               np.int16), jnp.int16)
    got = np.asarray(fuse_overwrite_pallas(
        cv1, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid), ff_recip=jnp.asarray(ff),
        interpret=True))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


def test_select_device_kernel_rules():
    """The ONE selection rule every device backend shares."""
    from image_stitcher_tpu.ops.pallas_fuse import select_device_kernel
    # CPU backend (tests): auto -> xla unless interpret forces pallas
    assert select_device_kernel(2048, 2048, np.uint16, 'auto') == 'xla'
    assert select_device_kernel(2048, 2048, np.uint16, 'auto',
                                interpret=True) == 'pallas'
    # unaligned tile extents ride pallas via padded_tile_extents now
    fired = []
    assert select_device_kernel(100, 1500, np.uint16, 'pallas',
                                interpret=True,
                                on_fallback=lambda: fired.append(1)) \
        == 'pallas'
    # off-TPU, an explicit pallas request falls back with notice
    assert select_device_kernel(2048, 2048, np.uint16, 'pallas',
                                on_fallback=lambda: fired.append(1)) == 'xla'
    assert fired == [1]
    # explicit xla is always honored
    assert select_device_kernel(2048, 2048, np.uint16, 'xla',
                                interpret=True) == 'xla'


def test_pick_chunk_rows_impossible_budget_raises():
    """A budget no aligned chunk fits must fail actionably, not hand
    back the full-height chunk that already failed the cost check."""
    from image_stitcher_tpu.ops.pallas_fuse import (_pick_chunk_rows,
                                                    align_y_for)
    with pytest.raises(ValueError, match="VMEM"):
        _pick_chunk_rows(32, 32, 2, align_y_for(np.uint16),
                         budget=1_000, win_bytes_per_elem=8)


# -------------------------------------------------- unaligned cameras

@pytest.mark.parametrize("th,tw", [(50, 70), (100, 96), (96, 100),
                                   (120, 150)])
def test_pallas_unaligned_tiles_match_xla(rng, th, tw):
    """Tile extents that are NOT multiples of the Mosaic (sublane, lane)
    tiling (1000^2 / 1920x1200-class cameras, scaled down) must ride the
    window kernel via internal padding, byte-equal to the XLA scan."""
    from image_stitcher_tpu.ops.pallas_fuse import pallas_supported
    assert pallas_supported(th, tw, np.uint16)
    C, Z, H, W = 2, 1, 3 * th - 7, 3 * tw - 5
    tiles, info, crops, valid = _problem(rng, n=10, C=C, Z=Z, H=H, W=W,
                                         th=th, tw=tw)
    cv0 = jnp.zeros(padded_canvas_shape(C, Z, H, W, th, tw), jnp.uint16)
    expect = np.asarray(fuse_overwrite(
        cv0, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid)))[:, :, :H, :W]
    cv1 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, th, tw),
                    jnp.uint16)
    got = np.asarray(fuse_overwrite_pallas(
        cv1, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid),
        interpret=True))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("th,tw", [(50, 70), (100, 96)])
def test_pallas_unaligned_fused_flatfield_matches_xla(rng, th, tw):
    """Unaligned tiles + fused flatfield: the zero-padded ff rows/cols
    must never leak into output (the folded crops mask them)."""
    from image_stitcher_tpu.ops.fuse import apply_flatfield
    C, Z, H, W = 2, 1, 2 * th + 13, 2 * tw + 9
    tiles, info, crops, valid = _problem(rng, n=8, C=C, Z=Z, H=H, W=W,
                                         th=th, tw=tw)
    ff = (rng.random((C, th, tw)) * 0.8 + 0.6).astype(np.float32)
    corrected = apply_flatfield(jnp.asarray(tiles), jnp.asarray(ff),
                                jnp.asarray(info[:, 0]), jnp.uint16)
    cv0 = jnp.zeros(padded_canvas_shape(C, Z, H, W, th, tw), jnp.uint16)
    expect = np.asarray(fuse_overwrite(
        cv0, corrected, jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid)))[:, :, :H, :W]
    cv1 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, th, tw),
                    jnp.uint16)
    got = np.asarray(fuse_overwrite_pallas(
        cv1, jnp.asarray(tiles), jnp.asarray(info),
        jnp.asarray(crops), jnp.asarray(valid), ff_recip=jnp.asarray(ff),
        interpret=True))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


def test_pallas_unaligned_feather_matches_xla(rng):
    """Feather ramps on unaligned tiles: the folded bottom/right crops
    must leave the ramp geometry of the REAL tile window untouched."""
    from image_stitcher_tpu.ops.fuse import finalize_feather, fuse_feather
    from image_stitcher_tpu.ops.pallas_fuse import fuse_feather_pallas
    C, Z, th, tw = 1, 1, 60, 100
    H, W = 2 * th + 11, 2 * tw + 3
    tiles, info, crops, valid = _problem(rng, n=8, C=C, Z=Z, H=H, W=W,
                                         th=th, tw=tw)
    shp = padded_canvas_shape(C, Z, H, W, th, tw)
    acc_x, w_x = fuse_feather(jnp.zeros(shp, jnp.float32),
                              jnp.zeros(shp, jnp.float32),
                              jnp.asarray(tiles), jnp.asarray(info),
                              jnp.asarray(crops), jnp.asarray(valid),
                              blend_px=12)
    expect = np.asarray(finalize_feather(acc_x, w_x,
                                         jnp.uint16))[:, :, :H, :W]
    pshp = pallas_padded_canvas_shape(C, Z, H, W, th, tw, np.uint16)
    acc_p, w_p = fuse_feather_pallas(
        jnp.zeros(pshp, jnp.float32), jnp.zeros(pshp, jnp.float32),
        jnp.asarray(tiles), jnp.asarray(info), jnp.asarray(crops),
        jnp.asarray(valid), blend_px=12, interpret=True)
    got = np.asarray(finalize_feather(acc_p, w_p, jnp.uint16))[:, :, :H, :W]
    np.testing.assert_array_equal(got, expect)


def test_pallas_supported_widened():
    """Production camera shapes that used to be rejected now pass; only
    VMEM-impossible tiles are refused."""
    from image_stitcher_tpu.ops.pallas_fuse import pallas_supported
    assert pallas_supported(1000, 1000, np.uint16)
    assert pallas_supported(1200, 1920, np.uint16)
    assert pallas_supported(2048, 2048, np.uint16)
    assert not pallas_supported(64, 3_000_000, np.uint16)  # VMEM-impossible
