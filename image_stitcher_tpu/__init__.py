"""image_stitcher_tpu — TPU-native microscopy image stitching framework.

A ground-up JAX/XLA/Pallas rebuild of the Squid microscope stitcher
(reference: sohamazing/image-stitcher): acquisition parsing, BaSiC-style
flatfield correction, FFT phase-correlation registration with subpixel
refinement, batched tile fusion into (T,C,Z,Y,X) canvases, and multiscale
OME-Zarr / OME-TIFF output — one jit-compiled engine instead of the
reference's three divergent CPU pipelines.
"""

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
    params = StitchingParameters(input_folder=input_folder, **kwargs)
    pipeline = StitchPipeline(params, options, reporter, stop_event)
    pipeline.run()
    return pipeline


__all__ = [
    'Acquisition', 'EngineOptions', 'ProgressReporter', 'StitchCancelled',
    'StitchingParameters', 'scan_acquisition', 'stitch',
]
