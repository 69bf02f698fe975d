"""Native (C++) host-side kernels, loaded via ctypes.

The host-side hot loops in this framework are inherently sequential scans: the
quantizer's ECDF knot search (the reference compiles the same loops with numba,
``_quantizer.py:18-73``) and the isotonic calibrator's pool-adjacent-violators stack
(the reference uses sklearn's C implementation). They are built lazily with the system
C++ compiler on first import and cached next to the source; when no compiler is
available the package transparently falls back to the pure-Python implementations in
``ops/quantizer.py`` and ``models/isotonic.py``.
"""

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "knot_scan.cpp"), os.path.join(_HERE, "pav.cpp")]
_LIB_PATH = os.path.join(_HERE, "_native.so")


def _build_library() -> str | None:
    src_mtime = max(os.path.getmtime(src) for src in _SRCS)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= src_mtime:
        return _LIB_PATH
    for compiler in ("g++", "c++", "clang++"):
        tmp_path = None
        try:
            # Build in a temp file then atomically rename, so concurrent imports race safely.
            with tempfile.NamedTemporaryFile(
                suffix=".so", dir=_HERE, delete=False
            ) as tmp:
                tmp_path = tmp.name
            result = subprocess.run(
                [compiler, "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", tmp_path],
                capture_output=True,
                timeout=120,
            )
            if result.returncode == 0:
                os.replace(tmp_path, _LIB_PATH)
                return _LIB_PATH
        except (OSError, subprocess.SubprocessError):
            continue
        finally:
            # Clean the temp file on EVERY non-success path (absent compiler raises
            # FileNotFoundError before the unlink a success-path-only cleanup would
            # run, leaking orphan .so files into the package dir on each import).
            if tmp_path is not None and os.path.exists(tmp_path):
                try:
                    os.unlink(tmp_path)
                except OSError:
                    pass
    return None


_lib = None
_lib_path = _build_library()
if _lib_path is not None:
    try:
        _lib = ctypes.CDLL(_lib_path)
        _lib.knot_scan.restype = ctypes.c_int64
        _lib.knot_scan.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib.pav_fit.restype = None
        _lib.pav_fit.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
    except OSError:
        _lib = None

if _lib is None:
    knot_scan = None  # ops/quantizer.py falls back to the pure-Python scan.
    pav_fit = None  # models/isotonic.py falls back to the pure-Python stack loop.
else:

    def pav_fit(y: np.ndarray, w: np.ndarray) -> np.ndarray:
        """Native counterpart of ``models.isotonic.pool_adjacent_violators``."""
        y = np.ascontiguousarray(y, dtype=np.float64)
        w = np.ascontiguousarray(w, dtype=np.float64)
        if y.shape != w.shape:
            msg = f"y and w must have the same length; got {y.shape} and {w.shape}"
            raise ValueError(msg)  # the C loop would read w out of bounds
        n = len(y)
        out = np.empty(n, dtype=np.float64)
        means = np.empty(n, dtype=np.float64)
        weights = np.empty(n, dtype=np.float64)
        counts = np.empty(n, dtype=np.int64)
        as_f64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))  # noqa: E731
        _lib.pav_fit(
            as_f64(y),
            as_f64(w),
            n,
            as_f64(out),
            as_f64(means),
            as_f64(weights),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out

    def knot_scan(
        xs: np.ndarray,
        ys: np.ndarray,
        knot: int,
        max_bin_error: int,
        max_bin_size: int,
        direction: int,
    ) -> tuple[int, int]:
        """Native counterpart of ``ops.quantizer._scan_knot`` (identical semantics).

        Callers pass float64/int64 contiguous arrays (the quantizer casts once per
        histogram), so no per-call copies happen here.
        """
        if xs.dtype != np.float64 or ys.dtype != np.int64:
            # Explicit raise, not assert: under `python -O` an assert vanishes and
            # the C kernel would reinterpret the buffers (reads past the end).
            msg = f"knot_scan needs float64/int64 arrays; got {xs.dtype}/{ys.dtype}"
            raise TypeError(msg)
        count = ctypes.c_int64(0)
        new_knot = _lib.knot_scan(
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(xs),
            knot,
            max_bin_error,
            max_bin_size,
            direction,
            ctypes.byref(count),
        )
        return int(new_knot), int(count.value)
