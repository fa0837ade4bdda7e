"""Zarr v2 storage on tensorstore (C++ I/O threads, async chunk writes).

Replaces the reference's zarr-python/dask/ome-zarr write stack
(stitcher.py:771-859, zarr_stitcher.py:395-440, and the six writer
variants in stitcher_process.py:958-1549) with one native-backed path:
tensorstore handles chunking, Blosc compression, and parallel file I/O
off the Python thread.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional, Sequence

import numpy as np
import tensorstore as ts

_DTYPE_TO_ZARR = {
    np.dtype('uint8'): '|u1', np.dtype('int8'): '|i1',
    np.dtype('uint16'): '<u2', np.dtype('int16'): '<i2',
    np.dtype('uint32'): '<u4', np.dtype('int32'): '<i4',
    np.dtype('uint64'): '<u8', np.dtype('int64'): '<i8',
    np.dtype('float32'): '<f4', np.dtype('float64'): '<f8',
}

# tensorstore fsyncs every chunk file by default (file_io_sync=true);
# measured on this host that caps raw-chunk writes at ~120 MB/s vs
# ~2 GB/s without — a 16x write-stage tax NO other zarr writer pays
# (zarr-python, the reference's entire write stack, never fsyncs).
# Durability parity says off; exporters to flaky media can flip it.
FILE_IO_SYNC = os.environ.get('STITCHER_FILE_IO_SYNC', '0') not in (
    '0', '', 'false', 'False')


def _ts_context() -> Dict:
    return {'file_io_sync': FILE_IO_SYNC}


def zarr_dtype_str(dtype) -> str:
    return _DTYPE_TO_ZARR[np.dtype(dtype)]


def create_zarr_array(
    path: str,
    shape: Sequence[int],
    chunks: Sequence[int],
    dtype,
    cname: str = 'zstd',
    clevel: int = 1,
    shuffle: int = 1,
    dimension_separator: str = '/',
    fill_value=0,
) -> ts.TensorStore:
    """Create (or overwrite) a zarr v2 array; returns an open TensorStore.

    Default compressor parity with the reference's production writer
    (zarr_stitcher.py:409: Blosc zstd, clevel=1, shuffle=SHUFFLE).
    ``cname=None`` stores chunks raw (compressor: null) — the right
    call for content that doesn't compress.
    """
    chunks = [min(int(c), int(s)) if s > 0 else int(c)
              for c, s in zip(chunks, shape)]
    compressor = (None if cname is None else
                  {'id': 'blosc', 'cname': cname,
                   'clevel': int(clevel), 'shuffle': int(shuffle)})
    spec = {
        'driver': 'zarr',
        'kvstore': {'driver': 'file', 'path': path},
        'metadata': {
            'shape': list(map(int, shape)),
            'chunks': list(map(int, chunks)),
            'dtype': zarr_dtype_str(dtype),
            'compressor': compressor,
            'fill_value': fill_value,
            'order': 'C',
            'dimension_separator': dimension_separator,
        },
        'create': True,
        'delete_existing': True,
        'context': _ts_context(),
    }
    return ts.open(spec).result()


def compute_shard_shape(shape: Sequence[int], chunks: Sequence[int],
                        shard_multiple: int = 16,
                        shard_multiple_y: int = 1):
    """(clamped read-chunk shape, shard shape) for a sharded v3 array.

    Shard (write) chunks are a multiple of the read chunk on the two
    trailing spatial axes, the read chunk elsewhere; extents divisible
    by the read chunk. Shared by the tensorstore creator and the raw
    shard writer so both agree on the on-disk grid."""
    chunks = [min(int(c), int(s)) if s > 0 else int(c)
              for c, s in zip(chunks, shape)]
    shard = list(chunks)
    for ax, mult in ((-2, shard_multiple_y), (-1, shard_multiple)):
        shard[ax] = min(int(shape[ax]), chunks[ax] * mult)
        shard[ax] -= shard[ax] % chunks[ax]
        shard[ax] = max(shard[ax], chunks[ax])
    return chunks, shard


def create_zarr3_sharded_array(
    path: str,
    shape: Sequence[int],
    chunks: Sequence[int],
    dtype,
    shard_multiple: int = 16,
    shard_multiple_y: int = 1,
    cname: str = 'zstd',
    clevel: int = 1,
    fill_value=0,
) -> ts.TensorStore:
    """Create a zarr v3 array with the sharding_indexed codec.

    Each shard file holds ``shard_multiple_y`` x ``shard_multiple`` read
    chunks in Y/X, so the on-disk file count drops by that product versus
    v2 — the answer to the reference's file-count pain at 12k-24k
    canvases (save_region_test.py sweeps exist because of it). Readable
    by zarr-python >= 3 and tensorstore.

    The default layout is Y-thin (one chunk row tall) and X-wide: the
    band-streaming fusers emit full-width slabs one chunk-row at a time,
    so a band write covers whole shards and never pays a shard
    read-modify-write at level 0 (a 4x4 shard would rewrite each level-0
    shard 4x under band streaming).
    """
    chunks, shard = compute_shard_shape(shape, chunks, shard_multiple,
                                        shard_multiple_y)
    spec = {
        'driver': 'zarr3',
        'kvstore': {'driver': 'file', 'path': path},
        'metadata': {
            'shape': list(map(int, shape)),
            'data_type': np.dtype(dtype).name,
            'fill_value': fill_value,
            'chunk_grid': {'name': 'regular',
                           'configuration': {'chunk_shape': shard}},
            'codecs': [{
                'name': 'sharding_indexed',
                'configuration': {
                    'chunk_shape': list(map(int, chunks)),
                    'codecs': [
                        {'name': 'bytes',
                         'configuration': {'endian': 'little'}},
                    ] + ([] if cname is None else [
                        {'name': 'blosc',
                         'configuration': {'cname': cname,
                                           'clevel': int(clevel),
                                           'shuffle': 'shuffle'}},
                    ]),
                    'index_codecs': [
                        {'name': 'bytes',
                         'configuration': {'endian': 'little'}},
                        {'name': 'crc32c'},
                    ],
                },
            }],
        },
        'create': True,
        'delete_existing': True,
        'context': _ts_context(),
    }
    return ts.open(spec).result()


def open_zarr_array(path: str, writable: bool = False) -> ts.TensorStore:
    """Open a zarr array, auto-detecting v2 vs v3 by its metadata file."""
    driver = ('zarr3' if os.path.exists(os.path.join(path, 'zarr.json'))
              else 'zarr')
    return ts.open({
        'driver': driver,
        'kvstore': {'driver': 'file', 'path': path},
        'context': _ts_context(),
    }, open=True, write=writable, read=True).result()


def write_group(path: str, attrs: Optional[Dict] = None,
                zarr_format: int = 2) -> None:
    """Make ``path`` a zarr group: v2 (.zgroup + .zattrs) or v3
    (zarr.json with node_type=group and inline attributes)."""
    os.makedirs(path, exist_ok=True)
    if zarr_format == 3:
        meta: Dict = {'zarr_format': 3, 'node_type': 'group'}
        if attrs is not None:
            meta['attributes'] = attrs
        _write_json_atomic(os.path.join(path, 'zarr.json'), meta)
        return
    _write_json_atomic(os.path.join(path, '.zgroup'), {'zarr_format': 2})
    if attrs is not None:
        write_attrs(path, attrs)


def _write_json_atomic(path: str, obj) -> None:
    """tmp + rename: concurrent writers of the SAME group metadata
    (parallel merge units sharing a plate row) each land a complete
    file instead of potentially interleaving into torn JSON."""
    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp"
    try:
        with open(tmp, 'w') as f:
            json.dump(obj, f, indent=4)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def write_attrs(path: str, attrs: Dict) -> None:
    os.makedirs(path, exist_ok=True)
    _write_json_atomic(os.path.join(path, '.zattrs'), attrs)


def read_attrs(path: str) -> Dict:
    """Group attributes: v2 .zattrs, or v3 zarr.json 'attributes'."""
    v3 = os.path.join(path, 'zarr.json')
    if os.path.exists(v3) and not os.path.exists(os.path.join(path, '.zattrs')):
        with open(v3) as f:
            return json.load(f).get('attributes', {})
    with open(os.path.join(path, '.zattrs')) as f:
        return json.load(f)
