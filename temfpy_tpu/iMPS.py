r"""Finite -> infinite MPS conversion and gauge fixing.

Same capabilities as the reference ``temfpy/iMPS.py``: Schmidt-vector
overlaps between two chains differing by one unit cell, orthogonal-Procrustes
gauge rotations with unitarity/Schmidt-mixing error metrics, and the
Fishman-White-style ``MPS_to_iMPS`` driver.

Conventions: overlap matrices are dense device arrays with rows = bra
(shorter chain) and columns = ket (longer chain) Schmidt bases for BOTH
left and right environments; the caller transposes for right-side
application (the reference encodes the same information in npc leg labels,
iMPS.py:21-62).
"""

from __future__ import annotations

import logging
import warnings
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from .config import NUMERICAL_TOL as _NUMERICAL_TOL
from .config import SCHMIDT_TOL as _SCHMIDT_TOL
from .config import UNITARY_TOL as _UNITARY_TOL
from .mps import MPS
from .mps.charged_linalg import charged_svd
from .ops.linalg import robust_svd
from .testing import assert_array_less

logger = logging.getLogger(__name__)


def overlap_schmidt(bra: MPS, ket: MPS, mode: str, n_sites: int | None = None):
    r"""Overlap matrix between the left (right) Schmidt vectors of two finite
    MPS (reference iMPS.py:21-62, there via TeNPy TransferMatrix).

    mode "left": contracts the first ``n_sites`` sites in left-canonical
    form; returns C with C[a, b] = <L'_a | L_b> (bra rows).
    mode "right": contracts the last ``n_sites`` sites in right-canonical
    form; returns D with D[a, b] = <R'_a | R_b> (bra rows).
    """
    mode = mode.lower()
    # host tensors contract in numpy (per-op jax dispatch in an accelerator
    # process costs ~0.4 ms and uploads host operands to the default device)
    xp = np if isinstance(bra._B[0], np.ndarray) else jnp
    if mode == "left":
        n = n_sites if n_sites is not None else min(bra.L, ket.L)
        E = xp.ones((1, 1), dtype=bra._B[0].dtype)
        for i in range(n):
            Tb = bra.get_B(i, "A")
            Tk = ket.get_B(i, "A")
            E = xp.einsum("ab,anc,bnd->cd", E, Tb.conj(), Tk)
    elif mode == "right":
        n = n_sites if n_sites is not None else min(bra.L, ket.L)
        E = xp.ones((1, 1), dtype=bra._B[0].dtype)
        for step in range(1, n + 1):
            Tb = bra.get_B(bra.L - step, "B")
            Tk = ket.get_B(ket.L - step, "B")
            E = xp.einsum("anc,bnd,cd->ab", Tb.conj(), Tk, E)
    else:
        raise ValueError("`mode` must be either 'left' or 'right', got " + repr(mode))
    return E


def infer_qtotal(M, q_row, q_col, chinfo) -> int:
    """Tensor charge of a charge-conserving matrix, read off at its largest
    entry: qtotal = q_row - q_col there (rule: q_row == q_col + qtotal)."""
    A = np.abs(np.asarray(M))
    i, j = np.unravel_index(int(A.argmax()), A.shape)
    return int(chinfo.make_valid(int(q_row[i]) - int(q_col[j])))


def basis_rotation(
    overlap,
    Schmidt_bra: np.ndarray,
    Schmidt_ket: np.ndarray,
    mode: str,
    *,
    form: str = "B",
    q_bra=None,
    q_ket=None,
    chinfo=None,
    qtotal: int | None = None,
    numerical_tol: float = _NUMERICAL_TOL,
    unitary_tol: float = _UNITARY_TOL,
    schmidt_tol: float = _SCHMIDT_TOL,
):
    r"""Optimal unitary gauge rotation between two Schmidt bases
    (reference iMPS.py:65-192).

    ``overlap`` has bra rows and ket columns (either environment side).
    Returns (rotation, unitary_error, schmidt_error); the rotation has the
    same row/column semantics as the input.

    When charge labels (``q_bra``, ``q_ket``, ``chinfo``) are supplied, the
    Procrustes SVD is charge-resolved, preserving exact block structure.
    """
    mode = mode.lower()
    assert mode in ("left", "right"), f"`mode` must be 'left' or 'right', got {mode!r}"
    form = form.upper()
    assert form in ("A", "B"), f"`form` must be 'A' or 'B', got {form!r}"

    xp = np if isinstance(overlap, np.ndarray) else jnp
    C = xp.asarray(overlap)
    S_bra = np.asarray(Schmidt_bra, float)
    S_ket = np.asarray(Schmidt_ket, float)

    C_Sk = C * xp.asarray(S_ket)[None, :]
    unitary_error_sq = float(np.sum(S_ket**2)) - float(
        xp.real(xp.sum(C_Sk.conj() * C_Sk))
    )
    if unitary_error_sq < 0:
        err_msg = (
            f"{mode.capitalize()} deviation from unitary: the square of the "
            f"unitary error {unitary_error_sq} is negative and exceeds the "
            f"numerical tolerance {numerical_tol:.1e}."
        )
        assert_array_less(abs(unitary_error_sq), numerical_tol, err_msg)
        unitary_error = 0.0
    else:
        unitary_error = float(np.sqrt(unitary_error_sq))
    logger.info("%s deviation from unitary: %.4e", mode.capitalize(), unitary_error)
    if unitary_error > unitary_tol:
        warnings.warn(
            f"\n{mode.capitalize()} overlap matrix deviates from unitarity by "
            f"{unitary_error}.\nIncreasing the bond dimension may be useful."
        )

    # orthogonal Procrustes: project onto the closest unitary
    if (mode, form) in (("left", "A"), ("right", "B")):
        M = xp.asarray(S_bra)[:, None] * C_Sk
    else:
        M = C_Sk * xp.asarray(S_ket)[None, :]

    if q_bra is not None and q_ket is not None and chinfo is not None:
        if qtotal is None:
            qtotal = infer_qtotal(M, q_bra, q_ket, chinfo)
        U, _S, Vh, _q, _err = charged_svd(M, q_bra, q_ket, chinfo, qtotal=qtotal)
        rotation = U @ Vh
    else:
        U, _S, Vh = robust_svd(M, full_matrices=False)
        rotation = U @ Vh

    if (mode, form) in (("left", "A"), ("right", "B")):
        Sb_C = xp.asarray(S_bra)[:, None] * xp.asarray(rotation)
    else:
        Sb_C = xp.asarray(rotation) * xp.asarray(S_ket)[None, :]
    schmidt_error = float(xp.linalg.norm(Sb_C - C_Sk))
    logger.info("%s Schmidt value mixing:   %.4e", mode.capitalize(), schmidt_error)
    if schmidt_error > schmidt_tol:
        warnings.warn(
            f"\nMixing between unequal Schmidt value sectors on the {mode} side is\n"
            f"{schmidt_error}. Increasing the number of sites may help."
        )
    return rotation, unitary_error, schmidt_error


class iMPSError(NamedTuple):
    """Approximation errors of a finite -> infinite MPS conversion
    (reference iMPS.py:195-230)."""

    left_unitary: float
    left_schmidt: float
    right_unitary: float
    right_schmidt: float

    @property
    def left_total(self) -> float:
        return (self.left_schmidt**2 + self.left_unitary**2) ** 0.5

    @property
    def right_total(self) -> float:
        return (self.right_schmidt**2 + self.right_unitary**2) ** 0.5

    @property
    def total_error(self) -> float:
        return float(np.linalg.norm(self))

    def __repr__(self) -> str:
        fields = [f"    {f}={x:.8e}" for f, x in zip(self._fields, self) if x != 0]
        if not fields:
            return "iMPSError()"
        return "iMPSError(\n" + ",\n".join(fields) + "\n)"


def _guess_offsets(mps_short: MPS, cut: int, offset) -> int:
    """Charge offset: 0 for Z_N charges, rounded S^2-weighted average of the
    bond labels for U(1) (reference iMPS.py:359-381)."""
    chinfo = mps_short.chinfo
    if isinstance(offset, (int, np.integer)):
        return int(offset)
    if offset == "auto":
        if chinfo.mod != 1:
            return 0
        S0 = mps_short.get_SL(cut)
        q = mps_short.q_bond[cut]
        return int(round(float((S0**2) @ q)))
    raise TypeError(f"Expected integer or 'auto' as offset, got {offset!r}")


def MPS_to_iMPS(
    mps_short: MPS,
    mps_long: MPS,
    sites_per_cell: int,
    cut: int,
    unitary_tol: float = _UNITARY_TOL,
    schmidt_tol: float = _SCHMIDT_TOL,
    offset="auto",
    unit_cell_width: int | None = None,
) -> tuple[MPS, iMPSError]:
    r"""Constructs an iMPS by comparing two finite MPS that differ by one
    repeating unit cell (reference iMPS.py:233-441).

    The repeating cell is taken from the longer chain; its gauge is fixed by
    Procrustes-matching its left and right environments to the Schmidt bases
    of the shorter chain.
    """
    L_short, L_long = mps_short.L, mps_long.L
    if L_short + sites_per_cell != L_long:
        raise ValueError(
            "The given two MPS must differ by one unit cell, got "
            f"{L_long} - {L_short} != {sites_per_cell}"
        )
    if mps_short.chinfo != mps_long.chinfo:
        raise ValueError("Incompatible ChargeInfo in the two MPS")
    assert all(f is not None for f in mps_short.form), "mps_short is not canonical"
    assert all(f is not None for f in mps_long.form), "mps_long is not canonical"

    # cylinder-width bookkeeping (reference iMPS.py:322-352)
    if unit_cell_width is None:
        cyl1 = mps_short.L // mps_short.unit_cell_width
        cyl2 = mps_long.L // mps_long.unit_cell_width
        if cyl1 != cyl2:
            warnings.warn(
                f"Unequal cylinder circumferences {cyl1}, {cyl2},\n"
                "discard `unit_cell_width` of input MPS"
            )
            cyl1 = 1
        if cut % max(cyl1, 1) != 0:
            warnings.warn(
                f"{cut = } not divisible into cylinder circumference {cyl1},\n"
                "discard `unit_cell_width` of input MPS"
            )
            cyl1 = 1
        unit_cell_width = sites_per_cell // cyl1
    else:
        assert sites_per_cell % unit_cell_width == 0, (
            f"{unit_cell_width = } does not divide {sites_per_cell = }"
        )
        cyl = sites_per_cell // unit_cell_width
        assert cut % cyl == 0, (
            f"{cut = } not divisible into requested cylinder circumference {cyl}"
        )

    chinfo = mps_short.chinfo
    S0 = mps_short.get_SL(cut)
    offset = _guess_offsets(mps_short, cut, offset)
    logger.info("Using charge offset %s", offset)

    # ---- left gauge rotation ----
    S_ket = mps_long.get_SL(cut)
    C = overlap_schmidt(mps_short, mps_long, "left", n_sites=cut)
    C, left_unitary, left_schmidt = basis_rotation(
        C,
        S0,
        S_ket,
        mode="left",
        q_bra=mps_short.q_bond[cut],
        q_ket=mps_long.q_bond[cut],
        chinfo=chinfo,
        unitary_tol=unitary_tol,
        schmidt_tol=schmidt_tol,
    )

    # ---- right gauge rotation ----
    n_right = L_short - cut
    S_ket_r = mps_long.get_SL(cut + sites_per_cell)
    D = overlap_schmidt(mps_short, mps_long, "right", n_sites=n_right)
    # per-cell charge: the two right bases describe the same states but their
    # "charge to the left" labels differ by the charge of one unit cell
    q_cell = -infer_qtotal(
        D, mps_short.q_bond[cut], mps_long.q_bond[cut + sites_per_cell], chinfo
    )
    D, right_unitary, right_schmidt = basis_rotation(
        D,
        S0,
        S_ket_r,
        mode="right",
        q_bra=mps_short.q_bond[cut],
        q_ket=mps_long.q_bond[cut + sites_per_cell],
        chinfo=chinfo,
        unitary_tol=unitary_tol,
        schmidt_tol=schmidt_tol,
    )

    # ---- extract the unit cell in right-canonical form ----
    sites = mps_long.sites[cut : cut + sites_per_cell]
    tensors = [mps_long.get_B(cut + i, "B") for i in range(sites_per_cell)]
    svs = [mps_long._S[cut + i] for i in range(1, sites_per_cell)]
    qts = list(mps_long.qtotal[cut : cut + sites_per_cell])

    # apply the gauge unitaries at the edges (host tensors stay numpy:
    # one stray jnp.einsum would upload the whole unit cell to the device)
    xp = np if isinstance(tensors[0], np.ndarray) else jnp
    tensors[0] = xp.einsum("ab,bnc->anc", xp.asarray(C), tensors[0])
    # new vR coefficient: T'[.., a] = sum_b T[.., b] <R'_a | R_b>
    tensors[-1] = xp.einsum("anb,cb->anc", tensors[-1], xp.asarray(D))

    svs = [S0] + svs + [S0]

    # bond charge labels: outer bonds use the short chain's basis, interior
    # bonds the long chain's; subtract the offset everywhere.  The per-cell
    # charge imbalance is absorbed into the LAST tensor's qtotal so that the
    # wrap-around bond carries identical labels on both ends.
    q0 = chinfo.make_valid(mps_short.q_bond[cut] - offset)
    q_bonds = [q0]
    for i in range(1, sites_per_cell):
        q_bonds.append(chinfo.make_valid(mps_long.q_bond[cut + i] - offset))
    q_bonds.append(q0)
    # restore the charge rule at the last site: its natural right labels were
    # the long chain's at cut+spc; replacing them by the short chain's shifts
    # the tensor charge by the per-cell charge
    qts[-1] = int(chinfo.make_valid(qts[-1] + q_cell))

    imps = MPS(
        sites,
        tensors,
        svs,
        form="B",
        bc="infinite",
        unit_cell_width=unit_cell_width,
        q_bonds=q_bonds,
        qtotals=qts,
    )
    error = iMPSError(left_unitary, left_schmidt, right_unitary, right_schmidt)
    return imps, error
