"""The host (NumPy/SciPy) twins must match the jitted device kernels."""

import numpy as np
import jax.numpy as jnp

from image_stitcher_tpu.ops.flatfield import (fit_flatfield_stack,
                                              fit_flatfield_stack_np)
from image_stitcher_tpu.ops.phasecorr import (phase_cross_correlation,
                                              phase_cross_correlation_np)

from fixtures import make_ground_truth


def test_flatfield_solvers_agree(rng):
    stack = (rng.random((12, 64, 64)).astype(np.float32) + 0.5)
    vign = 1.0 + 0.3 * rng.random((64, 64)).astype(np.float32)
    stack = stack * vign
    s_np = fit_flatfield_stack_np(stack, max_iters=80)
    s_jax = np.asarray(fit_flatfield_stack(jnp.asarray(stack), max_iters=80))
    np.testing.assert_allclose(s_np, s_jax, atol=2e-2, rtol=2e-2)


def test_phasecorr_twins_agree():
    base = np.asarray(make_ground_truth(96, 128, seed=5), np.float64)
    f = np.fft.fft2(base)
    fy = np.fft.fftfreq(96)[:, None]
    fx = np.fft.fftfreq(128)[None, :]
    moving = np.real(np.fft.ifft2(f * np.exp(2j * np.pi * (fy * 3.4 - fx * 5.2))))
    s_np = phase_cross_correlation_np(base, moving, 10)
    s_jax = np.asarray(phase_cross_correlation(
        jnp.asarray(base), jnp.asarray(moving), upsample_factor=10))
    np.testing.assert_allclose(s_np, s_jax, atol=0.1)
    np.testing.assert_allclose(s_np, [3.4, -5.2], atol=0.1)
