import numpy as np
import jax.numpy as jnp

from image_stitcher_tpu.ops.fuse import (
    fuse_overwrite, fuse_feather, finalize_feather, apply_flatfield,
    padded_canvas_shape)


def np_reference_place(canvas, tile, y, x, crops):
    """Mirror of the reference placement semantics (stitcher.py:576-598):
    crop tile edges, offset position by the crop, clamp to canvas."""
    top, bottom, left, right = crops
    th, tw = tile.shape
    t = tile[top:th - bottom if bottom else th, left:tw - right if right else tw]
    yy, xx = y + top, x + left
    y_end = min(yy + t.shape[0], canvas.shape[0])
    x_end = min(xx + t.shape[1], canvas.shape[1])
    canvas[yy:y_end, xx:x_end] = t[:y_end - yy, :x_end - xx]
    return canvas


def run_fuse(canvas_hw, tiles, metas, crops, valid, C=1, Z=1):
    H, W = canvas_hw
    th, tw = tiles.shape[1:]
    cv = jnp.zeros(padded_canvas_shape(C, Z, H, W, th, tw), dtype=tiles.dtype)
    cv = fuse_overwrite(cv, jnp.asarray(tiles), jnp.asarray(metas, jnp.int32),
                        jnp.asarray(crops, jnp.int32), jnp.asarray(valid))
    return np.asarray(cv)[:, :, :H, :W]


def test_single_tile_placement():
    tile = np.arange(6 * 8, dtype=np.uint16).reshape(6, 8)
    out = run_fuse((20, 20), tile[None], [[0, 0, 3, 5]], [[0, 0, 0, 0]],
                   [True])
    np.testing.assert_array_equal(out[0, 0, 3:9, 5:13], tile)
    assert out.sum() == tile.sum()


def test_overwrite_order_later_wins():
    t1 = np.full((4, 4), 7, np.uint16)
    t2 = np.full((4, 4), 9, np.uint16)
    out = run_fuse((10, 10), np.stack([t1, t2]),
                   [[0, 0, 0, 0], [0, 0, 2, 2]],
                   [[0, 0, 0, 0]] * 2, [True, True])
    assert out[0, 0, 3, 3] == 9  # overlap: later tile wins
    assert out[0, 0, 0, 0] == 7


def test_crops_masked_out():
    tile = np.full((6, 6), 5, np.uint16)
    out = run_fuse((12, 12), tile[None], [[0, 0, 2, 2]], [[1, 2, 1, 0]], [True])
    ref = np_reference_place(np.zeros((12, 12), np.uint16), tile, 2, 2, (1, 2, 1, 0))
    np.testing.assert_array_equal(out[0, 0], ref)


def test_invalid_tiles_are_noops():
    tile = np.full((4, 4), 3, np.uint16)
    out = run_fuse((8, 8), tile[None], [[0, 0, 0, 0]], [[0, 0, 0, 0]], [False])
    assert out.sum() == 0


def test_canvas_edge_clamp_matches_reference():
    tile = np.arange(25, dtype=np.uint16).reshape(5, 5) + 1
    # place so tile hangs off bottom-right; reference truncates
    out = run_fuse((7, 7), tile[None], [[0, 0, 4, 5]], [[0, 0, 0, 0]], [True])
    ref = np_reference_place(np.zeros((7, 7), np.uint16), tile, 4, 5, (0, 0, 0, 0))
    np.testing.assert_array_equal(out[0, 0], ref)


def test_multi_channel_z_routing():
    t1 = np.full((3, 3), 1, np.uint16)
    t2 = np.full((3, 3), 2, np.uint16)
    out = run_fuse((6, 6), np.stack([t1, t2]),
                   [[1, 0, 0, 0], [0, 1, 3, 3]],
                   [[0, 0, 0, 0]] * 2, [True, True], C=2, Z=2)
    assert out[1, 0, 0, 0] == 1
    assert out[0, 1, 3, 3] == 2
    assert out[0, 0].sum() == 0


def test_randomized_parity_with_reference_semantics(rng):
    H = W = 64
    th = tw = 16
    tiles = rng.integers(0, 65535, (10, th, tw), dtype=np.uint16)
    metas, crops = [], []
    ref = np.zeros((H, W), np.uint16)
    for i in range(10):
        y = int(rng.integers(0, H - 4))
        x = int(rng.integers(0, W - 4))
        cr = tuple(int(v) for v in rng.integers(0, 4, 4))
        metas.append([0, 0, y, x])
        crops.append(list(cr))
        ref = np_reference_place(ref, tiles[i], y, x, cr)
    out = run_fuse((H, W), tiles, metas, crops, [True] * 10)
    np.testing.assert_array_equal(out[0, 0], ref)


def test_feather_blend_continuity():
    # Two overlapping constant tiles of different values: feather must
    # produce values between them in the overlap, and exact values outside.
    t1 = np.full((8, 16), 100, np.uint16)
    t2 = np.full((8, 16), 200, np.uint16)
    H, W = 8, 24
    th, tw = 8, 16
    acc = jnp.zeros(padded_canvas_shape(1, 1, H, W, th, tw), jnp.float32)
    wsum = jnp.zeros_like(acc)
    acc, wsum = fuse_feather(acc, wsum, jnp.asarray(np.stack([t1, t2])),
                             jnp.asarray([[0, 0, 0, 0], [0, 0, 0, 8]], jnp.int32),
                             jnp.zeros((2, 4), jnp.int32),
                             jnp.asarray([True, True]), blend_px=4)
    out = np.asarray(finalize_feather(acc, wsum, jnp.uint16))[:, :, :H, :W]
    assert out[0, 0, 4, 2] == 100          # only tile 1
    assert out[0, 0, 4, 20] == 200         # only tile 2
    mid = out[0, 0, 4, 8:16]
    assert (mid >= 100).all() and (mid <= 200).all()
    assert out[0, 0, 4, 9] < out[0, 0, 4, 14]  # monotone ramp across overlap


def test_apply_flatfield_matches_reference_math():
    tiles = np.array([[[1000, 2000], [3000, 60000]]], np.uint16)
    ff = np.array([[[0.5, 1.0], [2.0, 0.5]]], np.float32)
    recip = (1.0 / ff).astype(np.float32)
    out = np.asarray(apply_flatfield(jnp.asarray(tiles), jnp.asarray(recip),
                                     jnp.asarray([0], jnp.int32), jnp.uint16))
    # exact vs the host reciprocal-multiply formulation...
    exact = (tiles[0].astype(np.float32) * recip[0]).clip(0, 65535)
    np.testing.assert_array_equal(out[0], exact.astype(np.uint16))
    # ...and within 1 LSB of the reference's divide
    ref = (tiles[0] / ff[0]).clip(0, 65535).astype(np.uint16)
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 1
