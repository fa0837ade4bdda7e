"""Float64 NumPy reference implementation of subpixel phase correlation.

Our own implementation of the published Guizar-Sicairos matrix-DFT
algorithm (the one scikit-image implements), kept in float64 to serve as
the CPU ground truth for parity tests, since scikit-image itself is not
installed in this environment. Validated independently against known
analytic translations in test_phasecorr.py.
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
