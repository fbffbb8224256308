"""Regression tests: eigenvalues planted exactly at the truncation cutoff.

The two sides of an entanglement cut are diagonalised independently; an
eigenvalue sitting at the cutoff (lambda = svd_min^2) can be classified as
entangled on one side and filled/empty on the other due to solver rounding.
The mode-count reconciliation (slater._widen_window, the max-count
reconciliation in pfaffian.SchmidtModes.from_eigh_majorana) must absorb the
discrepancy; these tests plant such eigenvalues and check the conversions
complete and reproduce the exact state (VERDICT round-1 item 9).
"""

import numpy as np
import pytest

from temfpy_tpu import pfaffian, slater

import oracles


SVD_MIN = 1e-6
CUTOFF = SVD_MIN**2  # classification happens on eigenvalues (lambda)


def planted_slater_C(L, lams):
    """Number-conserving correlation matrix whose center-cut entanglement
    spectrum is exactly ``lams``: occupied orbitals are two-site bonding
    combinations straddling the cut, orbital k on (k, L//2 + k) with left
    weight 1 - lams[k]."""
    assert len(lams) <= L // 2
    C = np.zeros((L, L))
    for k, lam in enumerate(lams):
        a, b = k, L // 2 + k
        u, v = np.sqrt(1 - lam), np.sqrt(lam)
        orb = np.zeros(L)
        orb[a], orb[b] = u, v
        C += np.outer(orb, orb)
    return C


@pytest.mark.parametrize("eps", [0.0, 1e-18, -1e-18])
def test_slater_eigenvalue_at_cutoff(eps):
    L = 8
    lams = [0.3, CUTOFF * (1 + eps)]
    C = planted_slater_C(L, lams)
    mps = slater.C_to_MPS(C, {"chi_max": 64, "svd_min": SVD_MIN})
    # the state must reproduce <c^dag c> to the truncation level regardless
    # of which side of the cutoff the planted eigenvalue lands on
    got = mps.correlation_function("Cd", "C").T
    assert np.abs(got - C).max() < 1e-5


def planted_pfaffian_C(L, lams):
    """Nambu (complex-fermion basis) correlation matrix of a product of
    two-mode BCS pairs (k, L//2 + k): sqrt(1-lam) + sqrt(lam) c_a^dag c_b^dag
    acting on the vacuum, giving block eigenvalues {lam, 1-lam} at the
    center cut."""
    n = L
    C = np.zeros((2 * n, 2 * n), complex)
    # layout: index 2i = c^dag_i row, 2i+1 = c_i row; C = <Psi Psi^dag> with
    # Psi = (c^dag_0, c_0, ...): C[2i, 2j] = <c^dag_i c_j>^* ... use the
    # library's own convention via correlation_matrix of a crafted H instead.
    # Simpler: build the BdG Hamiltonian whose ground state is the pair
    # product: H = sum_k  e_k (th_k) with pairing angle th: the two-mode BdG
    # Hamiltonian  -mu(n_a + n_b) + D(c_a^dag c_b^dag + h.c.) has ground
    # state u + v c_a^dag c_b^dag with v^2 = lam for suitable (mu, D).
    H = np.zeros((2 * n, 2 * n), complex)
    for k, lam in enumerate(lams):
        a, b = k, L // 2 + k
        # choose angle: v^2 = lam -> tan(2 th) = D / mu with v = sin(th)
        th = np.arcsin(np.sqrt(lam))
        mu = -np.cos(2 * th)
        D = np.sin(2 * th)
        # c^dag c terms (diagonal): mu * (n_a + n_b) pattern of the
        # interleaved Nambu layout used by pfaffian.assert_nambu ("C"):
        H[2 * a, 2 * a] += mu / 2
        H[2 * a + 1, 2 * a + 1] -= mu / 2
        H[2 * b, 2 * b] += mu / 2
        H[2 * b + 1, 2 * b + 1] -= mu / 2
        # pairing D c^dag_a c^dag_b + h.c.
        H[2 * a, 2 * b + 1] += D / 2
        H[2 * b + 1, 2 * a] += D / 2
        H[2 * a + 1, 2 * b] += -D / 2
        H[2 * b, 2 * a + 1] += -D / 2
    # gap out untouched sites so the correlation matrix is well defined
    touched = set()
    for k in range(len(lams)):
        touched |= {k, L // 2 + k}
    for i in range(n):
        if i not in touched:
            H[2 * i, 2 * i] += -0.5
            H[2 * i + 1, 2 * i + 1] += 0.5
    return pfaffian.correlation_matrix(H, basis="C->M")


@pytest.mark.parametrize("eps", [0.0, 1e-18])
def test_pfaffian_eigenvalue_at_cutoff(eps):
    L = 6
    lams = [0.3, CUTOFF * (1 + eps)]
    C = planted_pfaffian_C(L, lams)
    mps = pfaffian.C_to_MPS(C, {"chi_max": 64, "svd_min": SVD_MIN}, basis="M")
    C_C = np.asarray(pfaffian.matrix_M2C(C))
    CdC = mps.correlation_function("Cd", "C").T
    assert np.abs(CdC - C_C[::2, ::2]).max() < 1e-5
    CC = mps.correlation_function("C", "C").T
    assert np.abs(CC - C_C[::2, 1::2]).max() < 1e-5


def test_pfaffian_reconciliation_direct():
    """Feed from_eigh_majorana hand-perturbed spectra that disagree at the
    cutoff and check the reconciliation yields consistent mode counts."""
    L = 6
    lams = [0.3, 0.1]
    C = planted_pfaffian_C(L, lams)
    x = L // 2
    from temfpy_tpu.ops.linalg import eigh_blocks

    e_all, v_all = eigh_blocks(C, [2 * x], "L")
    eL = np.asarray(e_all[0, : 2 * x])
    vL = np.asarray(v_all)[0, : 2 * x, : 2 * x]
    e_all, v_all = eigh_blocks(C, [2 * (L - x)], "R")
    eR = np.asarray(e_all[0, : 2 * (L - x)])
    vR = np.asarray(v_all)[0, 2 * x :, : 2 * (L - x)]

    # plant disagreement: nudge the smallest entangled eigenvalue just below
    # the cutoff on the left side only (and its Nambu mirror)
    cut = CUTOFF
    iL = np.argmin(np.abs(eL - 0.1))
    target = eL[iL]
    eL2 = eL.copy()
    eL2[np.isclose(eL, target)] = cut * (1 - 1e-12)
    eL2[np.isclose(eL, 1 - target)] = 1 - cut * (1 - 1e-12)
    eR2 = eR.copy()
    eR2[np.isclose(eR, target)] = cut * (1 + 1e-12)
    eR2[np.isclose(eR, 1 - target)] = 1 - cut * (1 + 1e-12)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # e-value consistency checks warn
        modes = pfaffian.SchmidtModes.from_eigh_majorana(
            C, x, {"chi_max": 64, "svd_min": SVD_MIN},
            eL=eL2, vL_raw=vL, eR=eR2, vR_raw=vR,
        )
    # the borderline mode must be kept on BOTH sides (max-count widening)
    assert modes.n_entangled == 2
    assert modes.vL is not None and modes.vR is not None
