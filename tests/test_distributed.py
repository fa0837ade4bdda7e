"""Multi-process (multi-host stand-in) distributed tests.

Two localhost processes federate via jax.distributed (Gloo CPU
collectives), build the pod (data=processes, canvas=local-devices)
mesh, psum across the DCN axis, and run ShardedCanvas fusion on the
global mesh with parity against the single-device kernel — the JAX
analogue of the reference's multi-worker Pool fan-out
(zarr_stitcher.py:570-612).
"""

import numpy as np
import pytest

from image_stitcher_tpu.parallel.distributed import run_localhost_validation


def test_two_process_localhost_validation():
    run_localhost_validation(num_processes=2, devices_per_process=2)


def test_pod_mesh_single_process_shape():
    """Single-process fallback: the pod mesh equals a (1, n_local) grid
    with data across processes and canvas across local devices."""
    import jax
    from image_stitcher_tpu.parallel.distributed import make_pod_mesh
    mesh = make_pod_mesh()
    assert mesh.shape['data'] == jax.process_count()
    assert mesh.shape['canvas'] == len(jax.local_devices())

    with pytest.raises(ValueError):
        make_pod_mesh(local_shape=(3, 5))  # 15 != devices per process
