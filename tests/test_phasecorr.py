import numpy as np
import pytest

from image_stitcher_tpu.ops.phasecorr import (
    phase_cross_correlation, phase_cross_correlation_batch,
    normalize_to_dtype_range, horizontal_shift_from_pcc, vertical_shift_from_pcc)
from skimage_ref import phase_cross_correlation_ref

from fixtures import make_ground_truth


def shifted_pair(shape=(96, 128), dy=3.0, dx=-5.0, seed=0):
    """Generate a pair of images with an exact (dy, dx) circular shift,
    synthesized in Fourier domain so sub-pixel shifts are exact."""
    base = np.asarray(make_ground_truth(shape[0], shape[1], seed=seed), np.float64)
    f = np.fft.fft2(base)
    fy = np.fft.fftfreq(shape[0])[:, None]
    fx = np.fft.fftfreq(shape[1])[None, :]
    # moving = base displaced by (-dy, -dx), so pcc(base, moving) — the shift
    # that registers moving onto base — is exactly (dy, dx).
    moving = np.real(np.fft.ifft2(f * np.exp(+2j * np.pi * (fy * dy + fx * dx))))
    return base, moving


def test_reference_impl_exact_integer_shift():
    a, b = shifted_pair(dy=7, dx=-11)
    shift, _, _ = phase_cross_correlation_ref(a, b, upsample_factor=1)
    np.testing.assert_array_equal(shift, [7, -11])


def test_reference_impl_subpixel():
    a, b = shifted_pair(dy=2.3, dx=-4.7)
    shift, _, _ = phase_cross_correlation_ref(a, b, upsample_factor=10)
    assert abs(shift[0] - 2.3) <= 0.1
    assert abs(shift[1] - (-4.7)) <= 0.1


@pytest.mark.parametrize("dy,dx", [(0.0, 0.0), (5.0, 3.0), (-6.0, 9.0),
                                   (2.5, -3.1), (-0.4, 0.7), (10.8, -12.2)])
def test_jax_matches_reference(dy, dx):
    a, b = shifted_pair(dy=dy, dx=dx, seed=3)
    ref, _, _ = phase_cross_correlation_ref(a, b, upsample_factor=10)
    got = np.asarray(phase_cross_correlation(a, b, upsample_factor=10))
    # BASELINE target: within 0.1 px of the f64 reference
    np.testing.assert_allclose(got, ref, atol=0.1)
    # and both near ground truth
    np.testing.assert_allclose(got, [dy, dx], atol=0.15)


def test_upsample_factor_one():
    a, b = shifted_pair(dy=4, dx=-2)
    got = np.asarray(phase_cross_correlation(a, b, upsample_factor=1))
    np.testing.assert_array_equal(got, [4, -2])


def test_batch_matches_single():
    pairs = [shifted_pair(dy=d, dx=-d, seed=d) for d in (1, 2, 3, 4)]
    refs = np.stack([np.asarray(phase_cross_correlation(a, b, upsample_factor=10))
                     for a, b in pairs])
    batch_a = np.stack([p[0] for p in pairs])
    batch_b = np.stack([p[1] for p in pairs])
    got = np.asarray(phase_cross_correlation_batch(batch_a, batch_b, 10))
    np.testing.assert_allclose(got, refs, atol=1e-3)


def test_normalize_to_dtype_range():
    img = np.array([[100, 200], [300, 500]], np.uint16)
    out = np.asarray(normalize_to_dtype_range(img, 65535.0))
    assert out.min() == 0.0
    assert out.max() == pytest.approx(65535.0)
    # reference: (img - min)/(max - min) * 65535
    np.testing.assert_allclose(out[0, 1], (200 - 100) / 400 * 65535, rtol=1e-5)


def test_shift_conventions():
    # pcc returns (sy, sx) on overlap strips; reference subtracts strip extent
    assert horizontal_shift_from_pcc(np.array([1.4, 2.6]), 33) == (1, -30)
    assert vertical_shift_from_pcc(np.array([3.6, -1.4]), 33) == (-29, -1)


def test_noisy_subpixel_accuracy():
    a, b = shifted_pair(shape=(80, 100), dy=-3.4, dx=6.2, seed=9)
    rng = np.random.default_rng(5)
    scale = a.max()
    a = a + rng.normal(0, 0.01 * scale, a.shape)
    b = b + rng.normal(0, 0.01 * scale, b.shape)
    ref, _, _ = phase_cross_correlation_ref(a, b, upsample_factor=10)
    got = np.asarray(phase_cross_correlation(a, b, upsample_factor=10))
    np.testing.assert_allclose(got, ref, atol=0.1)
