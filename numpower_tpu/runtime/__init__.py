"""Native runtime bindings (ctypes over libndruntime.so).

The reference tracks every NDArray in a global C registry with allocation
counters (/root/reference/src/buffer.c) and exposes leak checks via env vars
(numpower.c:5268-5277). This module binds the C++ equivalent
(src/ndruntime.cpp) and lazily builds it with g++ on first import if the
shared object is missing. A pure-Python fallback keeps the package importable
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_HERE, "src", "ndruntime.cpp"),
    os.path.join(_HERE, "src", "scenario_stream.cpp"),
]
_LIB = os.path.join(_HERE, "libndruntime.so")

_lib = None
_build_lock = threading.Lock()


def _build() -> bool:
    with _build_lock:
        if os.path.exists(_LIB) and all(
            os.path.getmtime(_LIB) >= os.path.getmtime(s) for s in _SRCS
        ):
            return True
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 "-o", _LIB, *_SRCS],
                check=True, capture_output=True, timeout=180,
            )
            return True
        except Exception:
            return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.nptpu_register.argtypes = [ctypes.c_uint64]
    lib.nptpu_register.restype = ctypes.c_uint64
    lib.nptpu_unregister.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.nptpu_unregister.restype = ctypes.c_int
    lib.nptpu_stats.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    lib.nptpu_leak_check.restype = ctypes.c_uint64
    lib.nptpu_npy_save.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.nptpu_npy_save.restype = ctypes.c_int
    lib.nptpu_npy_read.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.nptpu_npy_read.restype = ctypes.c_int
    lib.nptpu_stream_create.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.nptpu_stream_create.restype = ctypes.c_void_p
    lib.nptpu_stream_acquire.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.nptpu_stream_acquire.restype = ctypes.c_int32
    lib.nptpu_stream_data.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nptpu_stream_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.nptpu_stream_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nptpu_stream_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


# --- Python fallback registry (used only if the .so cannot be built) --------

class _PyRegistry:
    def __init__(self):
        self._lock = threading.Lock()
        self._next = 1
        self._live = {}
        self.total_registered = 0
        self.total_freed = 0
        self.live_bytes = 0
        self.peak_bytes = 0

    def register(self, nbytes: int) -> int:
        with self._lock:
            uid = self._next
            self._next += 1
            self._live[uid] = nbytes
            self.total_registered += 1
            self.live_bytes += nbytes
            self.peak_bytes = max(self.peak_bytes, self.live_bytes)
            return uid

    def unregister(self, uid: int, nbytes: int) -> None:
        with self._lock:
            if uid in self._live:
                del self._live[uid]
                self.total_freed += 1
                self.live_bytes -= nbytes

    def stats(self):
        with self._lock:
            return {
                "total_registered": self.total_registered,
                "total_freed": self.total_freed,
                "live_count": len(self._live),
                "live_bytes": self.live_bytes,
                "peak_bytes": self.peak_bytes,
            }


_py_registry = _PyRegistry()


def native_available() -> bool:
    return _load() is not None


def register(nbytes: int) -> int:
    """add_to_buffer analogue (buffer.c:91-121) — returns a uuid."""
    lib = _load()
    if lib is not None:
        return int(lib.nptpu_register(int(nbytes)))
    return _py_registry.register(nbytes)


def unregister(uuid: int, nbytes: int) -> None:
    """buffer_ndarray_free analogue (buffer.c:61-75)."""
    lib = _load()
    if lib is not None:
        lib.nptpu_unregister(int(uuid), int(nbytes))
    else:
        _py_registry.unregister(uuid, nbytes)


def stats() -> dict:
    """buffer_dump counters analogue (buffer.c:15-33)."""
    lib = _load()
    if lib is not None:
        buf = (ctypes.c_uint64 * 5)()
        lib.nptpu_stats(buf)
        return {
            "total_registered": int(buf[0]),
            "total_freed": int(buf[1]),
            "live_count": int(buf[2]),
            "live_bytes": int(buf[3]),
            "peak_bytes": int(buf[4]),
        }
    return _py_registry.stats()


def leak_check() -> int:
    """vmemcheck analogue (gpu_alloc.c:36-40): live wrapper count."""
    return stats()["live_count"]


def npy_save_fast(path: str, arr) -> bool:
    """writev-based .npy writer; returns False if native lib unavailable or
    the array is not C-contiguous (caller falls back to np.save)."""
    import numpy as np
    from numpy.lib.format import header_data_from_array_1_0

    lib = _load()
    if lib is None:
        return False
    if not arr.flags["C_CONTIGUOUS"]:
        return False
    # Build the standard npy v1 header in Python (cheap); bulk write in C++.
    import io

    hdr_io = io.BytesIO()
    np.lib.format.write_array_header_1_0(hdr_io, header_data_from_array_1_0(arr))
    header = hdr_io.getvalue()
    rc = lib.nptpu_npy_save(
        path.encode(), header, len(header),
        arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes,
    )
    return rc == 0


def npy_read_fast(path: str):
    """mmap'd .npy reader (nptpu_npy_read): the header is parsed in Python
    (cheap), the data block is bulk-copied out of a read-only mapping in C++
    — one memcpy, no Python-level buffering. Returns the ndarray, or None if
    the native lib is unavailable or the file needs np.load's slow paths
    (fortran order, object dtype, unknown version) — caller falls back."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
            elif version == (2, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
            else:
                return None
            offset = f.tell()
    except Exception:
        return None
    if fortran or dtype.hasobject:
        return None
    arr = np.empty(shape, dtype)
    if arr.nbytes == 0:
        return arr
    rc = lib.nptpu_npy_read(
        path.encode(), offset, arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes
    )
    return arr if rc == 0 else None
