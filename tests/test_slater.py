"""End-to-end tests of the Slater -> MPS pipeline against exact
diagonalization (the reference library's examples double as this integration
suite; cf. reference examples/slater.py)."""

import numpy as np
import pytest

import temfpy_tpu.testing as tst
from temfpy_tpu import slater
from temfpy_tpu.schmidt_utils import StoppingCondition
from temfpy_tpu.utils import HT

import oracles

_ACTION = "raise"

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


def random_H(L, seed=0, corr_range=3.0):
    r = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(L), np.arange(L), indexing="ij")
    scale = np.exp(-abs(x - y) / corr_range)
    M = r.normal(size=(2, L, L), scale=scale)
    M = M[0] + 1j * M[1]
    return M + HT(M)


def test_correlation_matrix():
    H = hopping_H(8)
    C, N = slater.correlation_matrix(H)
    C = np.asarray(C)
    e = np.linalg.eigvalsh(np.asarray(H))
    assert N == (e < 0).sum()
    # projector property
    np.testing.assert_allclose(C @ C, C, atol=1e-12)
    np.testing.assert_allclose(np.trace(C), N, atol=1e-12)


def test_schmidt_modes_contract():
    """check_schmidt_decomposition (TEST_ACTION='raise') passes at a center cut."""
    H = random_H(10, seed=3)
    C, _ = slater.correlation_matrix(H)
    modes = slater.SchmidtModes.from_correlation_matrix(C, 5, {"chi_max": 64})
    assert modes.n_entangled > 0
    # eigenvalue pairing convention: e decreasing
    assert np.all(np.diff(modes.e) <= 1e-12)


def test_schmidt_values_norm():
    """Sum of squared Schmidt values ~ 1 when chi is large enough."""
    H = random_H(8, seed=5)
    C, _ = slater.correlation_matrix(H)
    sv = slater.SchmidtVectors.from_correlation_matrix(C, 4, {"chi_max": 256})
    assert abs(np.sum(sv.schmidt_values**2) - 1.0) < 1e-8


@pytest.mark.parametrize("L,seed", [(6, 0), (8, 1)])
def test_H_to_MPS_exact_fidelity(L, seed):
    """MPS statevector must match the exact Slater determinant."""
    H = random_H(L, seed=seed)
    mps = slater.H_to_MPS(H, {"chi_max": 128})
    psi_mps = mps.to_statevector()

    e, v = np.linalg.eigh(np.asarray(H))
    occ = v[:, e < 0]
    psi_exact = oracles.slater_statevector(occ)

    f = oracles.fidelity(psi_exact, psi_mps)
    assert f > 1 - 1e-10, f"fidelity {f}"
    # MPS normalised
    assert abs(mps.norm_squared() - 1) < 1e-10


def test_H_to_MPS_correlations():
    """Reconstruct <c^dag c> from the MPS (the reference example's check)."""
    L = 10
    H = random_H(L, seed=7)
    mps = slater.H_to_MPS(H, {"chi_max": 256})
    C, _ = slater.correlation_matrix(H)
    CdC = mps.correlation_function("Cd", "C").T
    dev = np.abs(CdC - np.asarray(C)).max()
    assert dev < 1e-8, f"max dev {dev}"


def test_H_to_MPS_truncation_still_accurate():
    """With a modest chi the hopping-chain ground state is well represented."""
    L = 12
    H = hopping_H(L)
    mps = slater.H_to_MPS(H, {"chi_max": 16})
    C, _ = slater.correlation_matrix(H)
    CdC = mps.correlation_function("Cd", "C").T
    dev = np.abs(CdC - np.asarray(C)).max()
    assert dev < 1e-4, f"max dev {dev}"


def test_bond_charges_consistent():
    L = 8
    H = random_H(L, seed=11)
    mps = slater.H_to_MPS(H, {"chi_max": 64})
    # charge conservation: every tensor entry violating the rule is zero
    for i in range(L):
        T = np.asarray(mps._B[i])
        qL = mps.q_bond[i][:, None, None]
        qp = mps.sites[i].charges[None, :, None]
        qR = mps.q_bond[i + 1][None, None, :]
        bad = (qL + qp - qR) != mps.qtotal[i]
        assert np.abs(T[bad]).max(initial=0.0) < 1e-12


def test_canonical_forms():
    L = 8
    H = random_H(L, seed=13)
    mps = slater.H_to_MPS(H, {"chi_max": 64})
    c = mps.form.index("B")
    for i in range(L):
        T = np.asarray(mps._B[i])
        if i < c:  # left-canonical
            g = np.einsum("anb,anc->bc", T.conj(), T)
        else:  # right-canonical
            g = np.einsum("anb,cnb->ac", T, T.conj())
        np.testing.assert_allclose(g, np.eye(len(g)), atol=1e-9)


def test_spinful_correlation_matrix():
    C = np.array([[0.5, 0.2], [0.2, 0.5]])
    C2 = np.asarray(slater.spinful_correlation_matrix(C, ph=False))
    np.testing.assert_allclose(C2[::2, ::2], C)
    np.testing.assert_allclose(C2[1::2, 1::2], C)
    C2 = np.asarray(slater.spinful_correlation_matrix(C, ph=True))
    np.testing.assert_allclose(C2[1::2, 1::2], np.eye(2) - C)


def test_sector_filtering():
    """trunc_par.sectors restricts the center-cut charges kept."""
    H = hopping_H(8)
    C, N = slater.correlation_matrix(H)
    sc = StoppingCondition(chi_max=32, sectors=2)
    sv = slater.SchmidtVectors.from_correlation_matrix(C, 4, sc)
    assert set(sv.idx_L) == {2}


def test_ortho_center():
    H = random_H(6, seed=17)
    mps = slater.H_to_MPS(H, {"chi_max": 64}, ortho_center=2)
    assert mps.form[:2] == ["A", "A"] and mps.form[2:] == ["B"] * 4
    e, v = np.linalg.eigh(np.asarray(H))
    psi_exact = oracles.slater_statevector(v[:, e < 0])
    assert oracles.fidelity(psi_exact, mps.to_statevector()) > 1 - 1e-10


def test_stream_lookahead_bit_identical(monkeypatch):
    """The one-block lookahead thread (TEMFPY_TPU_STREAM_LOOKAHEAD=1) must
    reproduce the serial sweep bit-for-bit: each cut's Schmidt data depends
    only on C, so pipelining the eigh_batch of block j+1 against block j's
    planning changes scheduling, never values."""
    H = random_H(24, seed=3)
    C, _ = slater.correlation_matrix(H)

    monkeypatch.setenv("TEMFPY_TPU_STREAM_LOOKAHEAD", "0")
    ref = slater.C_to_MPS(C, {"chi_max": 48}, eigh_chunk=4)
    monkeypatch.setenv("TEMFPY_TPU_STREAM_LOOKAHEAD", "1")
    out = slater.C_to_MPS(C, {"chi_max": 48}, eigh_chunk=4)

    assert ref.L == out.L
    for i in range(ref.L):
        np.testing.assert_array_equal(
            np.asarray(ref._B[i]), np.asarray(out._B[i])
        )
    for a, b in zip(ref._S, out._S):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
