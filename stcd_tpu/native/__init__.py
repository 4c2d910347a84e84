"""Native (C++) host-IO runtime: GIL-free JPEG/PNG decode + batch collate.

The reference's input pipeline leans on torch's C++ DataLoader workers +
PIL (ref train_sup.py:101-107, data/dataset.py:150-158); this is the
TPU-native equivalent.  ``stcd_io.cpp`` decodes with libjpeg/libpng
straight into caller-owned numpy buffers and fans a whole batch across a
std::thread pool — no Python objects, no GIL, one contiguous NHWC uint8
collate ready for the uint8 host->device transfer path (data/io.py).

Build model: zero-install.  The shared library is compiled lazily with
``g++ -O2 -shared`` on first use (cached next to the source, rebuilt when
the .cpp is newer) and every entry point degrades gracefully:

- toolchain or libjpeg/libpng missing  -> ``load()`` returns None, PIL path
- unsupported format (TIFF/BMP/CMYK)   -> per-file rc != 0, PIL fallback
- ``STCD_NO_NATIVE=1``                 -> disabled outright

Pixel parity with PIL is pinned by tests/test_native_io.py (PNG exact
incl. palette/alpha/gray; JPEG exact against this host's libjpeg-turbo).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "stcd_io.cpp")
_LIB = os.path.join(_DIR, "libstcd_io.so")

_lock = threading.Lock()
_lib = None          # ctypes.CDLL once loaded
_load_failed = False


def _build() -> bool:
    # compile to a process-unique temp path and publish with an atomic
    # rename: concurrent processes (parallel stage scripts, pytest-xdist)
    # must never dlopen a half-written .so
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-o", tmp, _SRC,
           "-ljpeg", "-lpng"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.warning("native IO build failed (%s); using PIL decode", e)
        return False
    if res.returncode != 0:
        logger.warning("native IO build failed:\n%s\nusing PIL decode",
                       res.stderr.strip()[-2000:])
        return False
    try:
        os.replace(tmp, _LIB)
    except OSError as e:
        logger.warning("native IO publish failed (%s); using PIL decode", e)
        return False
    return True


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.stcd_image_dims.argtypes = [ctypes.c_char_p, i32p, i32p]
    lib.stcd_image_dims.restype = ctypes.c_int
    lib.stcd_decode_rgb.argtypes = [ctypes.c_char_p, u8p,
                                    ctypes.c_int, ctypes.c_int]
    lib.stcd_decode_rgb.restype = ctypes.c_int
    lib.stcd_decode_rgb_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.stcd_decode_rgb_batch.restype = ctypes.c_int
    lib.stcd_io_abi_version.argtypes = []
    lib.stcd_io_abi_version.restype = ctypes.c_int
    return lib


def load() -> Optional[ctypes.CDLL]:
    """The bound library, building it on first call; None when the native
    path is unavailable (failure is cached — one warning, then silent)."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("STCD_NO_NATIVE") == "1":
        return None
    def _try_load():
        # AttributeError (missing symbol) and the ABI probe both catch a
        # stale .so built from an older stcd_io.cpp — the mtime freshness
        # test can't (a checkout gives .so and .cpp identical mtimes)
        lib = _bind(ctypes.CDLL(_LIB))
        if lib.stcd_io_abi_version() != 1:
            raise OSError("ABI version mismatch")
        return lib

    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        rebuilt = False
        if not (os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            if not _build():
                _load_failed = True
                return None
            rebuilt = True
        try:
            _lib = _try_load()
        except (OSError, AttributeError) as e:
            # stale library: rebuild once from source and retry
            if not rebuilt and _build():
                try:
                    _lib = _try_load()
                    return _lib
                except (OSError, AttributeError) as e2:
                    e = e2
            logger.warning("native IO unavailable (%s); using PIL decode", e)
            _load_failed = True
    return _lib


def available() -> bool:
    return load() is not None


def image_dims(path: str) -> Optional[Tuple[int, int]]:
    """(height, width) of a JPEG/PNG, or None (unsupported/unavailable)."""
    lib = load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.stcd_image_dims(os.fsencode(path), ctypes.byref(h),
                           ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_rgb(path: str) -> Optional[np.ndarray]:
    """Decode one image to (H, W, 3) uint8 RGB; None => caller falls back
    to PIL (unsupported format, decode error, or no native library)."""
    lib = load()
    if lib is None:
        return None
    dims = image_dims(path)
    if dims is None:
        return None
    h, w = dims
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.stcd_decode_rgb(
        os.fsencode(path), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w)
    return out if rc == 0 else None


def decode_rgb_batch(paths: Sequence[str], height: int, width: int,
                     num_threads: int = 4
                     ) -> Tuple[Optional[np.ndarray], List[bool]]:
    """Decode + collate ``paths`` into one (N, H, W, 3) uint8 array using
    the native thread pool.  Returns (batch, ok) where ok[i] flags files
    that decoded; failed rows are zero-filled for the caller to re-read
    via PIL.  (None, [False]*n) when the native library is unavailable."""
    n = len(paths)
    lib = load()
    if lib is None:
        return None, [False] * n
    out = np.zeros((n, height, width, 3), np.uint8)
    status = (ctypes.c_int * n)()
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    failures = lib.stcd_decode_rgb_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, num_threads, status)
    ok = [status[i] == 0 for i in range(n)]
    if failures:
        for i, good in enumerate(ok):
            if not good:
                out[i] = 0
    return out, ok
