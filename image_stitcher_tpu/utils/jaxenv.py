"""Pin the jax platform through the config API, honoring env intent.

Why this exists: the axon TPU plugin in this environment registers a
``get_backend`` hook that initializes the tunneled TPU runtime even when
``JAX_PLATFORMS=cpu`` is set — and under a dead tunnel that init stalls
the process forever (observed: the CLI hung 10 min inside
``jax.default_backend()`` with the env var set). The config API is the
one knob the plugin respects, so every in-process entry point (CLIs,
GUI, process-edition children, the pipeline itself) routes through
:func:`pin_jax_platform` before anything can touch a backend.

The autotune link probe (parallel/autotune.py ``_expected_backend``)
assumes ``JAX_PLATFORMS`` is truthful; this pin is what makes that
assumption hold in-process.
"""

from __future__ import annotations

import os
from typing import Optional

_pinned: Optional[str] = None


def requested_platforms() -> Optional[str]:
    """The platform list the environment asked for, or None.

    ``IMAGE_STITCHER_JAX_PLATFORM`` (our own knob — spawn children and
    tests use it because plugins may ignore ``JAX_PLATFORMS``) wins over
    ``JAX_PLATFORMS``.
    """
    return (os.environ.get("IMAGE_STITCHER_JAX_PLATFORM", "").strip()
            or os.environ.get("JAX_PLATFORMS", "").strip()
            or None)


def pin_jax_platform() -> Optional[str]:
    """Apply the env-requested platform via ``jax.config`` (idempotent).

    No-op when no env var is set (default plugin behavior preserved) or
    when jax already initialized a backend (too late to repin — the
    config update would be ignored or raise). Returns the pinned list,
    or None when nothing was pinned.
    """
    global _pinned
    want = requested_platforms()
    if not want:
        return None
    if _pinned == want:
        return _pinned
    try:
        import jax
        jax.config.update("jax_platforms", want)
        _pinned = want
    except Exception:
        return None
    return _pinned
