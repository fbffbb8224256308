"""Spinful conversions and the infinite Gutzwiller flow (reference
examples/gutzwiller.py extended to iMPS, cf. gutzwiller.py:284-486)."""

import numpy as np
import pytest

import temfpy_tpu.testing as tst
from temfpy_tpu import gutzwiller, slater

# full spinful/Gutzwiller conversions: the suite's heaviest integration
# tier; `pytest -m "not slow"` keeps the fast correctness tier under ~5 min
pytestmark = pytest.mark.slow

_ACTION = "warn"


@pytest.fixture(autouse=True)
def _set_test_action():
    old = tst.TEST_ACTION
    tst.TEST_ACTION = _ACTION
    yield
    tst.TEST_ACTION = old


def dimer_H(L, t1=-1.0, t2=-2.5):
    M = t1 * np.ones(L - 1)
    M[1::2] = t2
    M = np.diag(M, 1)
    return M + M.T


def test_spinful_H_to_MPS_charge():
    """spinful='PH' doubles the chain and conserves total N = L."""
    L = 8
    mps = slater.H_to_MPS(dimer_H(L), {"chi_max": 64}, spinful="PH")
    assert mps.L == 2 * L
    # PH doubling: N_up + (L - N_down) = L at half filling
    q_final = int(mps.q_bond[-1][0])
    assert q_final == L


def test_spinful_H_to_iMPS_and_infinite_gutzwiller():
    """H -> spinful iMPS -> infinite Gutzwiller projection end to end."""
    L_short = 16
    cell = 2
    cut = L_short // 2
    trunc = dict(chi_max=64)
    imps, err = slater.H_to_iMPS(
        dimer_H(L_short), dimer_H(L_short + cell), trunc, cell, cut, spinful="PH"
    )
    assert imps.L == 2 * cell  # doubled sites
    assert err.total_error < 0.05  # chi-truncation dominated (spinful chi ~ chi_single^2)

    spin = gutzwiller.abrikosov_ph(imps, inplace=False, return_canonical=True)
    assert spin.L == cell
    assert not spin.finite
    # canonical: right-canonical tensors and normalised Schmidt values
    for B in spin._B:
        B = np.asarray(B)
        g = np.einsum("anb,cnb->ac", B, B.conj())
        np.testing.assert_allclose(g, np.eye(len(g)), atol=1e-5)
    for S in spin._S:
        assert abs(np.linalg.norm(S) - 1) < 1e-8
    # entanglement spectrum is finite and nontrivial
    ent = spin.entanglement_entropy()
    assert np.all(np.isfinite(ent)) and ent.max() > 1e-3
    # the infinite canonicalization preserves the Sz quantum numbers (the
    # reference keeps them through TeNPy canonical_form_infinite1,
    # gutzwiller.py:473): bond labels must span several sectors ...
    assert any(len(np.unique(q)) > 1 for q in spin.q_bond)
    # ... the wrap bond must be consistent (up to the constant per-cell
    # charge drift carried by the unit cell) ...
    dq = spin.q_bond[spin.L] - spin.q_bond[0]
    assert dq.size and np.all(dq == dq[0])
    # ... the labels must be consistent with the tensors (charge rule) ...
    for i in range(spin.L):
        B = np.asarray(spin._B[i])
        qL = spin.q_bond[i][:, None, None]
        qp = np.asarray(spin.sites[i].charges)[None, :, None]
        qR = spin.q_bond[i + 1][None, None, :]
        bad = (qL + qp - qR - spin.qtotal[i]) != 0
        assert np.abs(B[bad]).max() < 1e-10 if bad.any() else True
    # ... and the per-charge entanglement spectrum is resolvable
    by_charge = spin.entanglement_spectrum(by_charge=True)
    assert len(by_charge[0]) > 1  # more than one Sz sector on the bond


def test_sector_restricted_C_to_MPS():
    """A sectors-restricted conversion keeps only the requested center charge."""
    from temfpy_tpu.schmidt_utils import StoppingCondition

    L = 8
    C, N = slater.correlation_matrix(dimer_H(L))
    sc = StoppingCondition(chi_max=16, sectors=N // 2)
    sv = slater.SchmidtVectors.from_correlation_matrix(C, L // 2, sc)
    assert set(sv.idx_L) == {N // 2}
