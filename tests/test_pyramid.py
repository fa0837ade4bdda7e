import numpy as np
import jax.numpy as jnp

from image_stitcher_tpu.ops.pyramid import (
    downsample_nearest, downsample_mean, level_shapes, downsample)


def test_nearest_is_stride2():
    x = np.arange(6 * 8).reshape(1, 1, 1, 6, 8).astype(np.uint16)
    out = np.asarray(downsample_nearest(jnp.asarray(x)))
    np.testing.assert_array_equal(out, x[..., ::2, ::2])


def test_nearest_odd_dims_floor():
    x = np.zeros((1, 1, 1, 7, 9), np.uint16)
    assert downsample_nearest(jnp.asarray(x)).shape == (1, 1, 1, 3, 4)


def test_mean_matches_block_mean():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 65535, (1, 2, 1, 8, 10), dtype=np.uint16)
    out = np.asarray(downsample_mean(jnp.asarray(x)))
    t = x[..., :8, :10].astype(np.float64)
    ref = t.reshape(1, 2, 1, 4, 2, 5, 2).mean(axis=(-3, -1))
    np.testing.assert_array_equal(out, np.floor(ref).astype(np.uint16))


def test_mean_trims_excess():
    x = np.ones((1, 1, 1, 7, 9), np.uint16) * 4
    out = np.asarray(downsample_mean(jnp.asarray(x)))
    assert out.shape == (1, 1, 1, 3, 4)
    assert (out == 4).all()


def test_level_shapes_iterated_floor():
    shapes = level_shapes((1, 3, 2, 1000, 900), 4)
    assert shapes == [(1, 3, 2, 1000, 900), (1, 3, 2, 500, 450),
                      (1, 3, 2, 250, 225), (1, 3, 2, 125, 112)]


def test_downsample_dispatch():
    x = jnp.zeros((1, 1, 1, 4, 4), jnp.uint16)
    assert downsample(x, 'nearest').shape == (1, 1, 1, 2, 2)
    assert downsample(x, 'mean').shape == (1, 1, 1, 2, 2)
    try:
        downsample(x, 'bicubic')
        assert False
    except ValueError:
        pass
