"""Gutzwiller projection tests against exact diagonalization
(cf. reference examples/gutzwiller.py)."""

import numpy as np
import pytest

import temfpy_tpu.testing as tst
from temfpy_tpu import gutzwiller, slater

import oracles

_ACTION = "warn"

import pytest as _pytest


@_pytest.fixture(autouse=True)
def _set_test_action():
    """TEST_ACTION is a library-wide global; pin it per test module (module
    collection order would otherwise leak the last import's setting)."""
    old = tst.TEST_ACTION
    tst.TEST_ACTION = _ACTION
    yield
    tst.TEST_ACTION = old



def hopping_H(L, t=-1.0):
    M = np.diag(t * np.ones(L - 1), 1)
    return M + M.T


def exact_projected_spin_state(C2: np.ndarray, keep):
    """Exact spin-1/2 statevector of the Gutzwiller-projected Slater
    determinant with (doubled) correlation matrix C2.

    keep = [(n_up_mode, n_dn_mode) for spin up, spin down]."""
    n = len(C2)
    L_spin = n // 2
    e, v = np.linalg.eigh(C2)
    occ = v[:, e > 0.5]
    psi_f = oracles.slater_statevector(occ)
    # select amplitudes of the physical configurations
    psi_s = np.zeros(1 << L_spin, dtype=complex)
    for s in range(1 << L_spin):
        f = 0
        for i in range(L_spin):
            spin_bit = (s >> (L_spin - 1 - i)) & 1  # 0 = up (index 0)
            n_up, n_dn = keep[spin_bit]
            if n_up:
                f |= 1 << (n - 1 - 2 * i)
            if n_dn:
                f |= 1 << (n - 1 - (2 * i + 1))
        psi_s[s] = psi_f[f]
    norm = np.linalg.norm(psi_s)
    assert norm > 1e-12, "projection killed the state"
    return psi_s / norm


@pytest.mark.parametrize("L", [4, 6])
def test_abrikosov_ph_vs_exact(L):
    H = hopping_H(L)
    mps_f = slater.H_to_MPS(H, {"chi_max": 128}, spinful="PH")
    mps_s = gutzwiller.abrikosov_ph(mps_f, inplace=False, return_canonical=True)

    C, _ = slater.correlation_matrix(H)
    C2 = np.asarray(slater.spinful_correlation_matrix(np.asarray(C), ph=True))
    psi_exact = exact_projected_spin_state(C2, keep=[(1, 1), (0, 0)])
    psi_mps = mps_s.to_statevector()
    f = oracles.fidelity(psi_exact, psi_mps)
    assert f > 1 - 1e-9, f"fidelity {f}"
    assert abs(mps_s.norm_squared() - 1) < 1e-9


def test_abrikosov_vs_exact():
    L = 4  # spin sites; fermion chain of L sites at half filling
    H = hopping_H(L)
    mps_f = slater.H_to_MPS(H, {"chi_max": 128}, spinful="simple")
    mps_s = gutzwiller.abrikosov(mps_f, inplace=False, return_canonical=True)

    C, _ = slater.correlation_matrix(H)
    C2 = np.asarray(slater.spinful_correlation_matrix(np.asarray(C), ph=False))
    psi_exact = exact_projected_spin_state(C2, keep=[(1, 0), (0, 1)])
    psi_mps = mps_s.to_statevector()
    f = oracles.fidelity(psi_exact, psi_mps)
    assert f > 1 - 1e-9, f"fidelity {f}"


def test_abrikosov_ph_spin_correlations():
    """Spin correlators of the projected MPS vs exact ones."""
    L = 6
    H = hopping_H(L)
    mps_f = slater.H_to_MPS(H, {"chi_max": 128}, spinful="PH")
    mps_s = gutzwiller.abrikosov_ph(mps_f, inplace=False)

    C, _ = slater.correlation_matrix(H)
    C2 = np.asarray(slater.spinful_correlation_matrix(np.asarray(C), ph=True))
    psi = exact_projected_spin_state(C2, keep=[(1, 1), (0, 0)])

    # exact <Sz_i Sz_j>
    Ls = L
    conf = np.arange(1 << Ls)
    bits = (conf[:, None] >> (Ls - 1 - np.arange(Ls))[None, :]) & 1
    sz = 0.5 - bits  # bit 0 (up) -> +1/2
    w = np.abs(psi) ** 2
    SzSz_exact = np.einsum("c,ci,cj->ij", w, sz, sz)

    zz = mps_s.correlation_function("Sz", "Sz")
    np.testing.assert_allclose(zz.real, SzSz_exact, atol=1e-8)
    # total Sz = 0 sector
    assert abs(mps_s.expectation_value("Sz").sum()) < 1e-8


def test_abrikosov_ph_entanglement_by_charge():
    """The reference example inspects the entanglement spectrum by charge."""
    L = 6
    mps_f = slater.H_to_MPS(hopping_H(L), {"chi_max": 64}, spinful="PH")
    mps_s = gutzwiller.abrikosov_ph(mps_f, inplace=False)
    spec = mps_s.entanglement_spectrum(by_charge=True)
    assert len(spec) == L - 1
    qs = [q for (q,), _s in spec[L // 2 - 1]]
    assert len(qs) >= 2  # multiple Sz sectors at the center bond


def test_abrikosov_ph_parity_conserving_input():
    """Pfaffian-style (parity-conserving) fermion MPS project too."""
    from temfpy_tpu import pfaffian

    L = 6  # fermion sites -> 3 spin sites
    # pair up/down via a PH-symmetric BdG state: use a simple hopping chain
    # expressed as a Nambu Hamiltonian (D = 0), half filling via mu = 0
    h = hopping_H(L) - 0.5 * np.eye(L)  # N = 4 (even parity), gapped
    H = np.zeros((2 * L, 2 * L), complex)
    H[::2, ::2] = h
    H[1::2, 1::2] = -h.T
    mps_f = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="C")
    mps_s = gutzwiller.abrikosov_ph(mps_f, inplace=False)
    assert mps_s.L == L // 2
    assert abs(mps_s.norm_squared() - 1) < 1e-8


def test_abrikosov_charge_check():
    """Wrong particle number must be rejected."""
    L = 4
    H = hopping_H(L) - 1.0 * np.eye(L)  # N = 3 != L/2 = 2
    mps_f = slater.H_to_MPS(H, {"chi_max": 32})
    with pytest.raises(AssertionError):
        gutzwiller.abrikosov(mps_f)
