"""Data-parallel wrappers for the batched compute ops.

Batch work (registration pairs, flatfield stacks, tile correction) shards
its leading axis across the mesh 'data' axis; XLA propagates the sharding
through the vmapped kernels, so each device computes its slice of the
batch with no manual collectives (reductions inside the flatfield fit
become psums automatically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops.fuse import apply_flatfield
from ..ops.phasecorr import phase_cross_correlation_batch
from .mesh import batch_sharding, replicated


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def sharded_phase_cross_correlation(mesh: Mesh, refs: jnp.ndarray,
                                    movings: jnp.ndarray,
                                    upsample_factor: int = 10) -> jnp.ndarray:
    """(N, H, W) pairs sharded over 'data' -> (N, 2) shifts."""
    refs, movings = shard_batch(mesh, refs, movings)
    return phase_cross_correlation_batch(refs, movings, upsample_factor)


def sharded_apply_flatfield(mesh: Mesh, tiles: jnp.ndarray,
                            flatfields: jnp.ndarray,
                            channel_idx: jnp.ndarray, out_dtype) -> jnp.ndarray:
    tiles, channel_idx = shard_batch(mesh, tiles, channel_idx)
    flatfields = jax.device_put(flatfields, replicated(mesh))
    return apply_flatfield(tiles, flatfields, channel_idx, out_dtype)
