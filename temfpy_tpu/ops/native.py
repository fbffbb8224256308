"""ctypes binding for the native C++ batched Pfaffian (native/pfaffian.cpp).

This is the host-side cross-validation path, playing the role pfapack's
C library plays for the reference (its only native dependency, reference
pfaffian.py:49).  The TPU compute path never calls this; tests use it to
certify the device kernel, and CPU-only deployments may use it directly.

The shared library is built on demand with the repo Makefile (g++); if no
compiler is available the binding degrades gracefully to a pure-numpy
fallback with identical semantics.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SO_PATH = _REPO_ROOT / "native" / "libtemfpy_pfaffian.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_SO_PATH.parent)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as err:  # no compiler / make: numpy fallback
            logger.info("native pfaffian build unavailable: %s", err)
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.pfaffian_batch_d.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.pfaffian_batch_z.argtypes = lib.pfaffian_batch_d.argtypes
        _lib = lib
    except OSError as err:
        logger.info("native pfaffian load failed: %s", err)
    return _lib


def have_native() -> bool:
    return _load() is not None


def pfaffian_batch(matrices: np.ndarray) -> np.ndarray:
    """Pfaffians of a (..., n, n) batch of skew-symmetric matrices on host.

    Uses the C++ library when available, else the numpy reference
    implementation from :mod:`temfpy_tpu.ops.pfaffian`.
    """
    matrices = np.asarray(matrices)
    *batch_shape, n, m = matrices.shape
    assert n == m and n % 2 == 0, f"need even square matrices, got {matrices.shape}"
    flat = matrices.reshape(-1, n, n)
    lib = _load()
    if lib is None:
        from .pfaffian import pfaffian_numpy

        out = np.array([pfaffian_numpy(A) for A in flat])
        if not np.iscomplexobj(matrices):
            out = out.real
        return out.reshape(batch_shape)

    if np.iscomplexobj(flat):
        a = np.ascontiguousarray(flat, dtype=np.complex128)
        out = np.empty(len(flat), dtype=np.complex128)
        lib.pfaffian_batch_z(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            len(flat),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    else:
        a = np.ascontiguousarray(flat, dtype=np.float64)
        out = np.empty(len(flat), dtype=np.float64)
        lib.pfaffian_batch_d(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            len(flat),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    return out.reshape(batch_shape)
