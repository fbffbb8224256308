"""iMPS extraction tests: splice-reconstruction overlap (the reference's
examples/iMPS*.py are the model) and gauge-error metrics."""

import numpy as np
import pytest

import temfpy_tpu.testing as tst
from temfpy_tpu import iMPS, slater, pfaffian
from temfpy_tpu.mps import MPS

import oracles  # noqa: F401

# these tests run at physically converged sizes where near-degenerate
# eigenvalue pairs make the internal 1e-8 contracts warn-level noisy (the
# reference defaults to "warn" for the same reason); the splice overlap and
# the gauge error metrics below are the real oracle
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



def dimer_H(L, t1=-1.0, t2=-4.0):
    M = t1 * np.ones(L - 1)
    M[1::2] = t2
    M = np.diag(M, 1)
    return M + M.T


def splice(mps_short, imps, n_cell, cut):
    """Finite MPS with n_cell extra unit cells inserted at `cut`
    (cf. reference examples/iMPS.py:31-37)."""
    spc = imps.L
    sites = mps_short.sites[:cut] + imps.sites * n_cell + mps_short.sites[cut:]
    Bs = list(mps_short._B[:cut]) + list(imps._B) * n_cell + list(mps_short._B[cut:])
    SVs = (
        [s for s in mps_short._S[:cut]]
        + [imps._S[j] for j in range(spc)] * n_cell
        + [s for s in mps_short._S[cut:]]
    )
    form = mps_short.form[:cut] + ["B"] * (spc * n_cell) + mps_short.form[cut:]
    return MPS(sites, Bs, SVs, form=form, bc="finite")


@pytest.mark.parametrize("n_cell", [1, 4])
def test_MPS_to_iMPS_splice_overlap(n_cell):
    trunc = dict(chi_max=48)
    L_short = 32
    cut = L_short // 2
    mps_short = slater.H_to_MPS(dimer_H(L_short), trunc)
    mps_long = slater.H_to_MPS(dimer_H(L_short + 2), trunc)

    imps, err = iMPS.MPS_to_iMPS(mps_short, mps_long, 2, cut, offset=0)
    assert err.total_error < 1e-4, repr(err)

    mps_vlong = slater.H_to_MPS(dimer_H(L_short + n_cell * 2), trunc)
    mps_rec = splice(mps_short, imps, n_cell, cut)
    ov = mps_vlong.overlap(mps_rec)
    assert abs(abs(ov) - 1) < 1e-6, f"reconstruction overlap {ov}"


def test_MPS_to_iMPS_offset_auto():
    trunc = dict(chi_max=32)
    L_short = 32
    mps_short = slater.H_to_MPS(dimer_H(L_short), trunc)
    mps_long = slater.H_to_MPS(dimer_H(L_short + 2), trunc)
    imps, err = iMPS.MPS_to_iMPS(mps_short, mps_long, 2, 16, offset="auto")
    # charge labels are small after the auto offset
    assert np.abs(imps.q_bond[0]).max() <= 2
    assert err.total_error < 1e-4


@pytest.mark.parametrize("n_cell", [1, 3])
def test_slater_H_to_iMPS_splice(n_cell):
    trunc = dict(chi_max=48)
    L_short = 32
    cut = L_short // 2
    imps, err = slater.H_to_iMPS(dimer_H(L_short), dimer_H(L_short + 2), trunc, 2, cut)
    assert err.total_error < 1e-4, repr(err)

    mps_short = slater.H_to_MPS(dimer_H(L_short), trunc)
    mps_vlong = slater.H_to_MPS(dimer_H(L_short + n_cell * 2), trunc)
    mps_rec = splice(mps_short, imps, n_cell, cut)
    ov = mps_vlong.overlap(mps_rec)
    assert abs(abs(ov) - 1) < 1e-6, f"reconstruction overlap {ov}"


def kitaev_H_C(L, t=1.0, mu=3.0, Delta=0.7):
    # mu > 2t: trivial phase, so the open-chain ground-state parity does not
    # depend on L and splices with any cell count stay in one parity sector
    h = np.zeros((L, L))
    D = np.zeros((L, L))
    for i in range(L - 1):
        h[i, i + 1] = h[i + 1, i] = -t
        D[i, i + 1] = Delta
        D[i + 1, i] = -Delta
    h -= mu * np.eye(L)
    H = np.zeros((2 * L, 2 * L), dtype=complex)
    H[::2, ::2] = h
    H[1::2, 1::2] = -h.T
    H[::2, 1::2] = D
    H[1::2, ::2] = -D.conj()
    return H


@pytest.mark.parametrize("n_cell", [1, 3])
def test_pfaffian_H_to_iMPS_splice(n_cell):
    trunc = dict(chi_max=48)
    L_short = 24
    cut = L_short // 2
    imps, err = pfaffian.H_to_iMPS(
        kitaev_H_C(L_short), kitaev_H_C(L_short + 1), trunc, 1, cut, basis="C"
    )
    assert err.total_error < 1e-4, repr(err)

    mps_short = pfaffian.H_to_MPS(kitaev_H_C(L_short), trunc, basis="C")
    mps_vlong = pfaffian.H_to_MPS(kitaev_H_C(L_short + n_cell), trunc, basis="C")
    mps_rec = splice(mps_short, imps, n_cell, cut)
    ov = mps_vlong.overlap(mps_rec)
    assert abs(abs(ov) - 1) < 1e-6, f"reconstruction overlap {ov}"


def test_imps_error_repr():
    e = iMPS.iMPSError(0.0, 0.0, 0.0, 0.0)
    assert repr(e) == "iMPSError()"
    e = iMPS.iMPSError(1e-8, 0.0, 0.0, 0.0)
    assert "left_unitary" in repr(e)
    assert e.total_error == pytest.approx(1e-8)


def test_length_mismatch_raises():
    trunc = dict(chi_max=16)
    m1 = slater.H_to_MPS(dimer_H(8), trunc)
    m2 = slater.H_to_MPS(dimer_H(12), trunc)
    with pytest.raises(ValueError):
        iMPS.MPS_to_iMPS(m1, m2, 2, 4)


def test_infinite_observables_match_finite_bulk():
    """<n_i> and <cd_i c_j> of an iMPS match the bulk of a long finite MPS
    (the reference gets infinite observables from TeNPy)."""
    import numpy as np

    from temfpy_tpu import slater

    def dimer_H(L, t1=-1.0, t2=-2.5):
        M = t1 * np.ones(L - 1)
        M[1::2] = t2
        M = np.diag(M, 1)
        return M + M.T

    L = 32
    cell = 2
    imps, _err = slater.H_to_iMPS(
        dimer_H(L), dimer_H(L + cell), {"chi_max": 48}, cell, L // 2
    )
    fin = slater.H_to_MPS(dimer_H(L), {"chi_max": 48})

    n_inf = imps.expectation_value("N").real
    n_fin = fin.expectation_value("N").real
    mid = L // 2
    # bulk site of matching sublattice parity
    np.testing.assert_allclose(n_inf[mid % cell], n_fin[mid], atol=2e-6)

    corr_inf = imps.correlation_function_infinite("Cd", "C", max_range=4)
    corr_fin = fin.correlation_function("Cd", "C")
    for r in range(1, 5):
        want = corr_fin[mid, mid + r]
        got = corr_inf[mid % cell, r - 1]
        np.testing.assert_allclose(got, want, atol=5e-6)


def test_infinite_correlation_function_general_pairs():
    """The general-pairs correlation_function on an infinite MPS (arbitrary
    sites1 x sites2, indices beyond the unit cell, both triangles) matches
    the bulk of a long finite conversion and the max_range variant
    (TeNPy ``MPS.correlation_function`` surface, reference gutzwiller
    examples)."""
    import numpy as np

    from temfpy_tpu import slater

    def dimer_H(L, t1=-1.0, t2=-2.5):
        M = t1 * np.ones(L - 1)
        M[1::2] = t2
        M = np.diag(M, 1)
        return M + M.T

    L = 32
    cell = 2
    imps, _err = slater.H_to_iMPS(
        dimer_H(L), dimer_H(L + cell), {"chi_max": 48}, cell, L // 2
    )
    fin = slater.H_to_MPS(dimer_H(L), {"chi_max": 48})
    corr_fin = fin.correlation_function("Cd", "C")
    mid = L // 2

    # beyond-cell pairs, both orders, vs the finite bulk (ranges <= 5:
    # longer separations differ from the L=32 finite bulk by its own
    # finite-size tail, not by conversion error)
    sites1 = [0, 1, 4]
    sites2 = [0, 2, 5]
    got = imps.correlation_function("Cd", "C", sites1, sites2)
    for k, i in enumerate(sites1):
        for l, j in enumerate(sites2):
            want = corr_fin[mid + i, mid + j]
            np.testing.assert_allclose(got[k, l], want, atol=5e-6,
                                       err_msg=f"pair {(i, j)}")

    # consistency with the max_range variant
    rng = imps.correlation_function_infinite("Cd", "C", max_range=6)
    got2 = imps.correlation_function("Cd", "C", [0], range(1, 7))
    np.testing.assert_allclose(got2[0], rng[0], atol=1e-12)

    # finite slicing surface
    sub = fin.correlation_function("Cd", "C", [3, 5], [4, 8])
    np.testing.assert_allclose(
        sub, corr_fin[np.ix_([3, 5], [4, 8])], atol=0
    )
