r"""Numerical self-verification contracts with controllable strictness.

API parity with reference ``temfpy/testing.py``: a global switch
:data:`TEST_ACTION` decides whether failed checks raise, warn, or are skipped
entirely.  These checks run *inside* the library at every algorithmic
checkpoint (eigenvalue pairing, Nambu symmetry, Schmidt-decomposition
reconstruction), forming an always-on numerical contract.

Device note: all checks convert to host numpy.  Set ``TEST_ACTION = "pass"``
to skip them entirely (no device->host transfer happens in that case), which
is the recommended production mode on TPU.
"""

from __future__ import annotations

import warnings
from typing import Literal

import numpy as np

from .utils import HT
from .config import DIAG_TOL as _DIAG_TOL  # noqa: F401  (re-export, ref testing.py:15)

TEST_ACTION: Literal["raise", "warn", "pass"] = "warn"
"""How library-internal checks behave: "raise" AssertionError, "warn" (default)
a :class:`ComparisonWarning`, or "pass" (skip, fastest)."""


class ComparisonWarning(Warning):
    """Warning issued when a library-internal numerical check fails."""


def _shape_mismatch(x, y, strict: bool = False) -> bool:
    if np.ndim(x) == 0 and np.ndim(y) == 0:
        return False
    if np.ndim(x) == 0 or np.ndim(y) == 0:
        return strict
    return np.shape(x) != np.shape(y)


def _dispatch(check, err_msg: str):
    """Runs `check` (a thunk raising AssertionError) according to TEST_ACTION."""
    if TEST_ACTION == "raise":
        check()
    elif TEST_ACTION == "warn":
        try:
            check()
        except AssertionError as err:
            warnings.warn("\n" + err_msg + str(err), category=ComparisonWarning)
    elif TEST_ACTION != "pass":
        raise ValueError(
            f"Invalid value {TEST_ACTION!r} of `temfpy_tpu.testing.TEST_ACTION`, "
            "must be one of 'raise', 'warn', 'pass'."
        )


def assert_allclose(
    actual,
    desired,
    rtol: float = 1e-7,
    atol: float = 0.0,
    equal_nan: bool = True,
    err_msg: str = "",
    verbose: bool = False,
    *,
    strict: bool = False,
):
    """Tolerance check honouring :data:`TEST_ACTION` (reference testing.py:54-93).

    Shape mismatches always raise, regardless of TEST_ACTION.
    """
    if TEST_ACTION == "pass":
        return
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    if _shape_mismatch(actual, desired, strict):
        np.testing.assert_allclose(
            actual, desired, rtol, atol, equal_nan, err_msg, verbose, strict=strict
        )
        return
    _dispatch(
        lambda: np.testing.assert_allclose(
            actual, desired, rtol, atol, equal_nan, err_msg, verbose, strict=strict
        ),
        err_msg,
    )


def assert_array_less(x, y, err_msg: str = "", verbose: bool = False, *, strict: bool = False):
    """Elementwise-less check honouring :data:`TEST_ACTION`
    (reference testing.py:96-128)."""
    if TEST_ACTION == "pass":
        return
    x = np.asarray(x)
    y = np.asarray(y)
    if _shape_mismatch(x, y, strict):
        np.testing.assert_array_less(x, y, err_msg, verbose, strict=strict)
        return
    _dispatch(
        lambda: np.testing.assert_array_less(x, y, err_msg, verbose, strict=strict),
        err_msg,
    )


def check_schmidt_decomposition(modes, C, diag_tol: float = _DIAG_TOL):
    """Verifies that Schmidt modes are consistent with the correlation matrix
    (reference testing.py:131-177).

    Checks that vL/vR are unitary, that they diagonalise the diagonal blocks
    C_LL / C_RR, and that the entangled modes SVD the offdiagonal block C_LR.
    Works for both Slater (:class:`temfpy_tpu.slater.SchmidtModes`) and
    Pfaffian (:class:`temfpy_tpu.pfaffian.SchmidtModes`) mode objects via
    their common interface (`vL`, `vR`, `eigenvalues`, `vL_entangled`,
    `vR_entangled`, `singular_values`).
    """
    if TEST_ACTION == "pass":  # skip all computation
        return

    C = np.asarray(C)
    tol = dict(rtol=0, atol=diag_tol)

    vL = None if modes.vL is None else np.asarray(modes.vL)
    vR = None if modes.vR is None else np.asarray(modes.vR)

    if vL is not None:
        N = len(vL)
        assert_allclose(vL @ HT(vL), np.eye(N), **tol, err_msg="vL is not unitary")
        CLL = (np.asarray(modes.eigenvalues("L")) * vL) @ HT(vL)
        assert_allclose(CLL, C[:N, :N], **tol, err_msg="vL does not diagonalise C_LL")
    if vR is not None:
        M = len(vR)
        n = len(C) - M
        assert_allclose(vR @ HT(vR), np.eye(M), **tol, err_msg="vR is not unitary")
        CRR = (np.asarray(modes.eigenvalues("R")) * vR) @ HT(vR)
        assert_allclose(CRR, C[n:, n:], **tol, err_msg="vR does not diagonalise C_RR")
    if vL is not None and vR is not None:
        assert n == N, f"Inconsistent sizes ({N} + {M} != {len(C)})"
        SV = np.asarray(modes.singular_values)
        vLE = np.asarray(modes.vL_entangled)
        vRE = np.asarray(modes.vR_entangled)
        # projected contract: the entangled modes must SVD C_LR *within
        # their span*.  The full reconstruction (SV vLE) vRE^H = C_LR used
        # by the reference (testing.py:172-177) has an intrinsic residual
        # floor of sqrt(largest truncated eigenvalue) <= svd_min from the
        # sub-cutoff modes' weight in C_LR, which spuriously exceeds
        # diag_tol on e.g. PH-doubled spectra; the projected form checks
        # exactly what the modes claim.
        S_proj = HT(vLE) @ np.asarray(C)[:N, N:] @ vRE[:, ::-1]
        assert_allclose(
            S_proj, np.diag(SV), **tol, err_msg="vL and vR do not SVD C_LR"
        )
