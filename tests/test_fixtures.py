"""The synthetic fixture generator is itself load-bearing (every
parity/quality/bench number flows through it), so its knobs get tests."""
import numpy as np

from fixtures import make_ground_truth


def test_quantize_bits_masks_low_bits():
    """gt_quantize_bits (the bench's 'compressible' content arm) must
    zero exactly the low bits for every supported dtype — numpy 2
    rejects the naive ~mask literal (regression: OverflowError)."""
    for dtype, bits in ((np.uint16, 6), (np.uint8, 3)):
        img = np.asarray(make_ground_truth(64, 96, seed=7, dtype=dtype,
                                           quantize_bits=bits))
        assert img.dtype == dtype
        assert (img & ((1 << bits) - 1)).max() == 0
        assert img.max() > 0  # masking must not wipe the signal
        plain = np.asarray(make_ground_truth(64, 96, seed=7, dtype=dtype))
        # quantization is the ONLY difference vs the unquantized texture
        mask = ~((1 << bits) - 1) & int(np.iinfo(dtype).max)
        np.testing.assert_array_equal(img, plain & np.array(mask, dtype))


def test_quantize_bits_zero_is_identity():
    a = np.asarray(make_ground_truth(48, 48, seed=3, quantize_bits=0))
    b = np.asarray(make_ground_truth(48, 48, seed=3))
    np.testing.assert_array_equal(a, b)
