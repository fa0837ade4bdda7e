"""image_stitcher_tpu — TPU-native microscopy image stitching framework.

A ground-up JAX/XLA/Pallas rebuild of the Squid microscope stitcher
(reference: sohamazing/image-stitcher): acquisition parsing, BaSiC-style
flatfield correction, FFT phase-correlation registration with subpixel
refinement, batched tile fusion into (T,C,Z,Y,X) canvases, and multiscale
OME-Zarr / OME-TIFF output — one jit-compiled engine instead of the
reference's three divergent CPU pipelines.
"""

import os as _os

# Persistent XLA compilation cache: stitching runs are short-lived
# processes (CLI / child process editions), so first-compile cost would
# otherwise be paid every run — and compiles through the remote axon
# backend can take minutes. Env vars are read by jax at interpreter
# startup (a site hook imports it before user code), so set the config
# directly. Opt out with ISTPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("ISTPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    _os.path.expanduser("~/.cache/image_stitcher_tpu/xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never block import on cache config
        pass

from .params import EngineOptions, StitchingParameters
from .io.acquisition import Acquisition, scan_acquisition
from .utils.progress import ProgressReporter, StitchCancelled

__version__ = "0.1.0"


def stitch(input_folder: str, **kwargs):
    """One-call convenience API: stitch an acquisition folder.

    Keyword args are StitchingParameters fields (plus ``options`` for an
    EngineOptions instance). Returns the StitchPipeline after the run.
    """
    from .models.pipeline import StitchPipeline
    options = kwargs.pop('options', None)
    reporter = kwargs.pop('reporter', None)
    stop_event = kwargs.pop('stop_event', None)
    resume = kwargs.pop('resume', False)
    params = StitchingParameters(input_folder=input_folder, **kwargs)
    pipeline = StitchPipeline(params, options, reporter, stop_event,
                              resume=resume)
    pipeline.run()
    return pipeline


from .api import StitchedImage, list_outputs, open_stitched

__all__ = [
    'Acquisition', 'EngineOptions', 'ProgressReporter', 'StitchCancelled',
    'StitchedImage', 'StitchingParameters', 'list_outputs', 'open_stitched',
    'scan_acquisition', 'stitch',
]
