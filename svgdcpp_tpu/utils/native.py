"""ctypes bindings for the native host helpers (native/svgd_host.cpp).

The shared library is built lazily on first use (g++ is in the image;
pybind11 is not, hence plain-C ABI + ctypes). Every entry point has a pure
NumPy fallback so the package works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsvgd_host.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _make(force: bool = False) -> None:
    cmd = ["make", "-s"] + (["-B"] if force else []) + ["-C", str(_NATIVE_DIR)]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            try:
                # Always run make (not just when the .so is missing): its
                # mtime tracking refreshes a STALE library — one built from
                # an older svgd_host.cpp that lacks newer entry points —
                # and is a no-op otherwise. Only insist on success when
                # there is no library at all (no toolchain + prebuilt .so
                # should still load).
                _make()
            except Exception:
                if not _LIB_PATH.exists():
                    raise
            try:
                lib = _bind(ctypes.CDLL(str(_LIB_PATH)))
            except AttributeError:
                # Missing symbol despite make (e.g. clock skew defeating
                # the mtime check): force one rebuild, then rebind. A
                # second AttributeError is a real failure -> fallback.
                _make(force=True)
                lib = _bind(ctypes.CDLL(str(_LIB_PATH)))
            _lib = lib
        except Exception:
            _load_failed = True
        return _lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.svgd_kth_element_f64.restype = ctypes.c_double
    lib.svgd_kth_element_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.svgd_median_f64.restype = ctypes.c_double
    lib.svgd_median_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.svgd_write_intermediate_log.restype = ctypes.c_int
    lib.svgd_write_intermediate_log.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ] + [ctypes.POINTER(ctypes.c_double)] * 4
    lib.svgd_write_intermediate_log_v2.restype = ctypes.c_int
    lib.svgd_write_intermediate_log_v2.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
    ] + [ctypes.POINTER(ctypes.c_double)] * 4
    lib.svgd_oracle_mvn_rbf_adagrad.restype = ctypes.c_int
    lib.svgd_oracle_mvn_rbf_adagrad.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
    ]
    return lib


def native_available() -> bool:
    return _load() is not None


def _as_f64_buffer(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.float64))


def kth_element(values, k: int) -> float:
    """k-th smallest (0-indexed) via std::nth_element; NumPy fallback."""
    buf = _as_f64_buffer(values).ravel().copy()
    if not 0 <= int(k) < buf.size:
        raise IndexError(f"k={k} out of range for {buf.size} values")
    lib = _load()
    if lib is None:
        return float(np.partition(buf, k)[k])
    return float(
        lib.svgd_kth_element_f64(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            buf.size,
            int(k),
        )
    )


def host_median(values) -> float:
    """Reference-semantics median (even-count averaging) on the host."""
    buf = _as_f64_buffer(values).ravel().copy()
    if buf.size == 0:
        raise ValueError("median of empty array")
    lib = _load()
    if lib is None:
        n = buf.size
        s = np.sort(buf)
        if n % 2 == 0:
            return float(0.5 * (s[n // 2 - 1] + s[n // 2]))
        return float(s[n // 2])
    return float(
        lib.svgd_median_f64(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), buf.size
        )
    )


def write_intermediate_log_native(path: str, lmg_ref, ker_ref, kgrad_ref,
                                  coords_ref, *, start_step: int = 1,
                                  append: bool = False) -> bool:
    """Write the debug log via the native writer.

    Inputs already in REFERENCE orientation: lmg/coords (T, m, n),
    ker (T, n, n), kgrad (T, m*n, n). ``start_step``/``append`` let a
    per-step driver extend an existing dump in O(new steps). Returns False
    if the native library is unavailable (caller falls back to the Python
    writer).
    """
    lib = _load()
    if lib is None:
        return False
    lmg = _as_f64_buffer(lmg_ref)
    ker = _as_f64_buffer(ker_ref)
    kgrad = _as_f64_buffer(kgrad_ref)
    coords = _as_f64_buffer(coords_ref)
    steps, m, n = lmg.shape
    rc = lib.svgd_write_intermediate_log_v2(
        str(path).encode(),
        steps,
        n,
        m,
        int(start_step),
        1 if append else 0,
        lmg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ker.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        kgrad.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        # rc mirrors native/svgd_host.cpp: 1 = fopen failed, 2 = fwrite
        # failed mid-dump (truncated partial file left on disk), 3 = fclose
        # failed (buffered data may be lost).
        reason = {
            1: f"cannot open {path} for writing",
            2: f"write failed mid-dump (disk full?); partial file left at {path}",
            3: f"close failed for {path} (buffered data may be lost)",
        }.get(rc, f"failed with code {rc} for {path}")
        err = RuntimeError(f"native log writer: {reason}")
        err.rc = rc
        raise err
    return True


def cpp_oracle_mvn_rbf_adagrad(coords, mean, cov_inv, *, gamma=None,
                               lr=0.1, iters=1):
    """Run the independent C++ per-pair SVGD oracle (MVN + isotropic RBF +
    AdaGrad). ``gamma=None`` recomputes the median-heuristic bandwidth every
    step. Returns the updated (n, m) coordinates; None if the native library
    is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    x = _as_f64_buffer(coords).copy()
    mean_b = _as_f64_buffer(mean)
    cov_b = _as_f64_buffer(cov_inv)
    rc = lib.svgd_oracle_mvn_rbf_adagrad(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.shape[0], x.shape[1],
        mean_b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cov_b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        -1.0 if gamma is None else float(gamma),
        float(lr), int(iters),
    )
    if rc != 0:
        raise RuntimeError(f"C++ oracle failed with code {rc}")
    return x
