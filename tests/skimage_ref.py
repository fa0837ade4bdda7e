"""Float64 NumPy oracle for subpixel phase correlation (test-only).

Transcribed from scikit-image's BSD-3-licensed
``skimage.registration.phase_cross_correlation`` /
``skimage.registration._upsampled_dft`` (the Guizar-Sicairos matrix-DFT
algorithm), kept in float64 so the oracle matches what the reference
pipeline (/root/reference/stitcher.py:510,523) actually calls —
scikit-image itself is not installable in this environment. Used ONLY as
a parity oracle in tests; the framework's own implementation lives in
``image_stitcher_tpu/ops/phasecorr.py`` and is derived independently.
Also validated against known analytic translations in test_phasecorr.py.

scikit-image license: BSD-3-Clause, Copyright the scikit-image team.
"""

import numpy as np


def upsampled_dft(data, upsampled_region_size, upsample_factor, axis_offsets):
    im2pi = 1j * 2 * np.pi
    dim_properties = list(zip(data.shape,
                              [upsampled_region_size] * data.ndim,
                              axis_offsets))
    for (n_items, ups_size, ax_offset) in dim_properties[::-1]:
        kernel = ((np.arange(ups_size) - ax_offset)[:, None]
                  * np.fft.fftfreq(n_items, upsample_factor))
        kernel = np.exp(-im2pi * kernel)
        data = np.tensordot(kernel, data, axes=(1, -1))
    return data


def phase_cross_correlation_ref(reference, moving, upsample_factor=10,
                                normalization="phase"):
    """Returns (shift_yx, error, phasediff) like the scikit-image API."""
    reference = np.asarray(reference, dtype=np.float64)
    moving = np.asarray(moving, dtype=np.float64)
    src_freq = np.fft.fft2(reference)
    target_freq = np.fft.fft2(moving)
    shape = src_freq.shape
    image_product = src_freq * target_freq.conj()
    if normalization == "phase":
        eps = np.finfo(image_product.real.dtype).eps
        image_product /= np.maximum(np.abs(image_product), 100 * eps)
    cross_correlation = np.fft.ifft2(image_product)

    maxima = np.unravel_index(np.argmax(np.abs(cross_correlation)),
                              cross_correlation.shape)
    midpoints = np.array([np.fix(axis_size / 2) for axis_size in shape])
    shifts = np.stack(maxima).astype(np.float64)
    shifts[shifts > midpoints] -= np.array(shape)[shifts > midpoints]

    if upsample_factor > 1:
        upsample_factor = np.array(upsample_factor, dtype=np.float64)
        shifts = np.round(shifts * upsample_factor) / upsample_factor
        upsampled_region_size = int(np.ceil(upsample_factor * 1.5))
        dftshift = np.fix(upsampled_region_size / 2.0)
        sample_region_offset = dftshift - shifts * upsample_factor
        cross_correlation = upsampled_dft(image_product.conj(),
                                          upsampled_region_size,
                                          upsample_factor,
                                          sample_region_offset).conj()
        maxima = np.unravel_index(np.argmax(np.abs(cross_correlation)),
                                  cross_correlation.shape)
        maxima = np.stack(maxima).astype(np.float64) - dftshift
        shifts += maxima / upsample_factor

    return shifts, None, None
