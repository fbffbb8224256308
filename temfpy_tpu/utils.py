"""Small generic utilities (API parity with reference ``temfpy/utils.py``).

The degenerate-block SVD completion (`block_svd`) lives in
:mod:`temfpy_tpu.ops.linalg` where it is implemented as a batched device
kernel; it is re-exported here for API compatibility with the reference
(``utils.block_svd``, reference utils.py:19-96).
"""

from __future__ import annotations

import logging

import numpy as np


def HT(M):
    """Hermitian conjugate of the input array (reference utils.py:8).

    Works on both numpy and jax arrays; for batched arrays conjugate-transposes
    the trailing two axes.
    """
    return M.conj().swapaxes(-1, -2)


def n_slice(x: slice) -> int:
    """Number of elements selected by a slice of a very long array
    (reference utils.py:13)."""
    step = x.step or 1
    return (x.stop - x.start) // step


def normalize_SV(lam: np.ndarray, logger: logging.Logger | None = None) -> np.ndarray:
    """Normalises Schmidt values, logging the norm (reference utils.py:99-103)."""
    norm = float(np.linalg.norm(lam))
    if logger is not None:
        logger.info("Norm of Schmidt values: %s", norm)
    return lam / norm


def __getattr__(name):
    if name == "block_svd":
        from .ops.linalg import block_svd

        return block_svd
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
