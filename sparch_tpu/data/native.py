"""ctypes bridge to the native C++ event-binning kernel.

Lazily builds ``native/binning.cpp`` with the system g++ on first use and
caches the shared library next to the source. Every public function has a
NumPy fallback so the framework runs (slower) without a toolchain; the
test suite asserts native and NumPy agree exactly.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "bin_events",
    "native_available",
    "freeverb_channel",
    "freeverb_available",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "binning.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libsparch_binning.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            ):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC",
                        "-o", _LIB, _SRC,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.bin_events.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.bin_events.restype = None
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            logger.info(f"native binning unavailable, using NumPy: {e}")
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Freeverb (sox reverb core) — host-side hot loop of audio augmentation
# ---------------------------------------------------------------------------

_FV_SRC = os.path.join(_REPO_ROOT, "native", "freeverb.cpp")
_FV_LIB = os.path.join(_REPO_ROOT, "native", "libsparch_freeverb.so")
_fv_lib: Optional[ctypes.CDLL] = None
_fv_tried = False


def _load_freeverb() -> Optional[ctypes.CDLL]:
    global _fv_lib, _fv_tried
    with _lock:
        if _fv_tried:
            return _fv_lib
        _fv_tried = True
        try:
            if not os.path.exists(_FV_LIB) or (
                os.path.exists(_FV_SRC)
                and os.path.getmtime(_FV_SRC) > os.path.getmtime(_FV_LIB)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _FV_LIB, _FV_SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_FV_LIB)
            lib.freeverb_channel.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.freeverb_channel.restype = None
            _fv_lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            logger.info(f"native freeverb unavailable, using SciPy: {e}")
            _fv_lib = None
        return _fv_lib


def freeverb_available() -> bool:
    return _load_freeverb() is not None


def freeverb_channel(
    x: np.ndarray,
    comb_lens: np.ndarray,
    ap_lens: np.ndarray,
    feedback: float,
    damp: float,
) -> Optional[np.ndarray]:
    """One Freeverb channel via the native kernel; None when the toolchain
    is unavailable (caller falls back to the SciPy formulation)."""
    lib = _load_freeverb()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    comb_lens = np.ascontiguousarray(comb_lens, np.int64)
    ap_lens = np.ascontiguousarray(ap_lens, np.int64)
    out = np.empty_like(x)
    lib.freeverb_channel(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(x)),
        comb_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(comb_lens)),
        ap_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(ap_lens)),
        ctypes.c_double(feedback),
        ctypes.c_double(damp),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def _bin_events_np(
    times: np.ndarray, units: np.ndarray, edges: np.ndarray,
    nb_steps: int, nb_units: int,
) -> np.ndarray:
    # Events at/after the last edge digitize to nb_steps and are DROPPED —
    # matching the reference, where torch's sparse-to-dense silently
    # discards the out-of-range indices (spiking_datasets.py:66-78).
    idx = np.digitize(times, edges)
    keep = (idx < nb_steps) & (units >= 0) & (units < nb_units)
    out = np.zeros((nb_steps, nb_units), np.float32)
    np.add.at(out, (idx[keep], units[keep]), 1.0)
    return out


def bin_events(
    times: np.ndarray,
    units: np.ndarray,
    edges: np.ndarray,
    nb_steps: int,
    nb_units: int,
) -> np.ndarray:
    """Dense (nb_steps, nb_units) spike raster from event times/units."""
    lib = _load()
    times = np.ascontiguousarray(times, np.float64)
    units = np.ascontiguousarray(units, np.int64)
    if lib is None:
        return _bin_events_np(times, units, edges, nb_steps, nb_units)
    edges = np.ascontiguousarray(edges, np.float64)
    out = np.zeros((nb_steps, nb_units), np.float32)
    lib.bin_events(
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        units.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(times)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(edges)),
        ctypes.c_int64(nb_steps),
        ctypes.c_int64(nb_units),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
