"""Native host kernels (C, bound via ctypes).

Compiled on demand with the system compiler into the user cache; every
caller falls back to the NumPy implementation when no compiler is
available, so the native layer is an accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LIB = None
_TRIED = False
_LOCK = threading.Lock()

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'hostops.c')


def _cpu_tag() -> str:
    """A stable fingerprint of this host's ISA: -march=native binaries
    from one CPU can SIGILL on another (shared NFS homes, migrated
    containers), so the cache path must be CPU-specific."""
    import hashlib
    import platform
    ident = platform.machine()
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    ident += line
                    break
    except OSError:
        ident += platform.processor()
    return hashlib.sha1(ident.encode()).hexdigest()[:12]


def _build_dir() -> str:
    return os.path.expanduser(
        f'~/.cache/image_stitcher_tpu/native-{_cpu_tag()}')


def _build() -> Optional[str]:
    out_dir = _build_dir()
    os.makedirs(out_dir, exist_ok=True)
    # cache key = hash of the SOURCE, not mtimes: archive-preserved
    # mtimes (sdist/tar deploys, NFS clock skew) can make a stale .so
    # pass an mtime check, and a stale binary missing newly-bound
    # symbols would disable the whole native layer
    import hashlib
    with open(_SRC, 'rb') as f:
        src_tag = hashlib.sha1(f.read()).hexdigest()[:12]
    so_path = os.path.join(out_dir, f'libhostops-{src_tag}.so')
    if os.path.exists(so_path):
        return so_path
    for cc in (os.environ.get('CC'), 'cc', 'gcc', 'clang'):
        if not cc:
            continue
        try:
            # build to a unique temp name, then atomic-rename: concurrent
            # processes (spawned editions) may race on the cache path
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                [cc, '-O3', '-march=native', '-shared', '-fPIC',
                 _SRC, '-o', tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
            # evict binaries of older source revisions: nothing loads
            # them again, and months of iteration would otherwise pile
            # up dead .so files. Age-gated (>1 day) so a concurrent
            # process still deploying yesterday's source isn't raced
            # between its exists() check and CDLL load.
            import glob
            import time
            cutoff = time.time() - 86400
            for old in glob.glob(os.path.join(out_dir, 'libhostops-*.so')):
                try:
                    if old != so_path and os.path.getmtime(old) < cutoff:
                        os.unlink(old)
                except OSError:
                    pass
            return so_path
        except Exception:
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The hostops library, built+loaded lazily; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        try:
            if os.environ.get('ISTPU_NO_NATIVE'):
                return None
            so_path = _build()
            if so_path is None:
                return None
            try:
                lib = ctypes.CDLL(so_path)
            except OSError:
                # another process's eviction can unlink the cached .so
                # between _build()'s exists() check and this load (two
                # checkouts at different source revisions sharing the
                # cache dir); rebuild once instead of silently running
                # the whole process on the NumPy fallbacks
                try:
                    os.unlink(so_path)
                except OSError:
                    pass
                so_path = _build()
                if so_path is None:
                    return None
                lib = ctypes.CDLL(so_path)
            pd = ctypes.c_ssize_t
            ci = ctypes.c_int
            vp = ctypes.c_void_p
            lib.place_u16.argtypes = [vp, pd, vp, pd, vp, pd,
                                      ci, ci, ci, ci, pd, pd]
            lib.place_u8.argtypes = list(lib.place_u16.argtypes)
            lib.feather_u16.argtypes = [vp, vp, pd, vp, pd, vp, pd,
                                        ci, ci, ci, ci,
                                        ci, ci, ci, ci, pd, pd,
                                        ctypes.c_float]
            lib.feather_u8.argtypes = list(lib.feather_u16.argtypes)
            for f in (lib.place_u16, lib.place_u8, lib.feather_u16,
                      lib.feather_u8):
                f.restype = None
            c64 = ctypes.c_longlong
            lib.write_rows_contig.argtypes = [ci, vp, c64, c64, c64,
                                              vp, c64, c64]
            lib.write_rows_contig.restype = c64
            lib.downsample2x_u16.argtypes = [vp, pd, vp, pd, pd, pd]
            lib.downsample2x_u8.argtypes = list(lib.downsample2x_u16.argtypes)
            lib.downsample2x2_mean_u16.argtypes = list(
                lib.downsample2x_u16.argtypes)
            lib.downsample2x2_mean_u8.argtypes = list(
                lib.downsample2x_u16.argtypes)
            for f in (lib.downsample2x_u16, lib.downsample2x_u8,
                      lib.downsample2x2_mean_u16, lib.downsample2x2_mean_u8):
                f.restype = None
            lib.finalize_feather_u16.argtypes = [vp, vp, pd, vp, pd, pd, pd]
            lib.finalize_feather_u8.argtypes = list(
                lib.finalize_feather_u16.argtypes)
            for f in (lib.finalize_feather_u16, lib.finalize_feather_u8):
                f.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        finally:
            _TRIED = True
    return _LIB
