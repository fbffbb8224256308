"""Direct parity against the genuine reference library.

SURVEY.md §4 oracle (a): run the reference's own algorithmic core
(loaded via tests/reference_oracle.py — pure numpy/scipy once TeNPy and
pfapack are stubbed at their narrow interfaces) and compare against this
package at sizes far beyond exact diagonalization.

Two layers of comparison:

1. *Spectrum parity*: per-cut Schmidt values from the reference's
   ``SchmidtVectors.from_correlation_matrix`` (slater and pfaffian)
   against this package's per-bond Schmidt values — including the
   truncation decisions (``svd_min``, ``chi_max``), so subset
   enumeration and the stopping condition are compared end to end.
2. *State fidelity*: the reference's truncated MPS is assembled densely
   (left-canonical A chain, entries computed as overlap determinants of
   occupied reference Schmidt orbitals — the identity documented at
   reference slater.py:873-928) and contracted against this package's
   ``C_to_MPS`` output.  The assembly itself is anchored to exact
   diagonalization at L=8 (``test_assembly_matches_ed``), so at L=32-96
   a fidelity of 1 certifies both states are the *same* truncated state,
   gauge-independently.

Everything here runs the reference's Python, not a re-implementation:
``SchmidtModes``/``SchmidtVectors``/``lowest_sums``/``StoppingCondition``
drive the enumeration, and only the final dense tensor entries are
computed by this file's (ED-anchored) determinant loop.
"""

from __future__ import annotations

import numpy as np
import pytest

from reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference source not present"
)

if reference_available():
    load_reference()
    import temfpy.pfaffian as ref_pf
    import temfpy.schmidt_utils as ref_su
    import temfpy.slater as ref_sl
    import temfpy.utils as ref_ut

import temfpy_tpu.pfaffian as my_pf
import temfpy_tpu.slater as my_sl
import temfpy_tpu.schmidt_utils as my_su
import temfpy_tpu.utils as my_ut
from oracles import fidelity, slater_statevector


# ---------------------------------------------------------------------------
# dense assembly of the reference's truncated MPS
# ---------------------------------------------------------------------------


def _batched_det(O, rows, cols, chunk=64):
    """det(O[ix_(rows[a], cols[b])]) for all (a, b); rows (A, c), cols (B, c)."""
    A, c = rows.shape
    B = len(cols)
    out = np.empty((A, B), dtype=O.dtype)
    if c == 0:
        out[:] = 1.0
        return out
    for a0 in range(0, A, chunk):
        r = rows[a0 : a0 + chunk]
        M = O[r[:, None, :, None], cols[None, :, None, :]]
        out[a0 : a0 + chunk] = np.linalg.det(M)
    return out


def _ref_dense_A_chain(C, trunc_par):
    """Left-canonical dense site tensors of the reference's truncated MPS.

    Entries A^{n}_{ab} = <n_i (x) L^{(i)}_a | L^{(i+1)}_b> computed as
    determinants of overlaps of occupied reference Schmidt orbitals, with
    the physical orbital appended last (the reference's left-mode
    convention, slater.py:1026-1040).  Returns (tensors, per-cut
    SchmidtVectors, final-cut schmidt values).
    """
    L = len(C)
    svs = [
        ref_sl.SchmidtVectors.from_correlation_matrix(C, x, trunc_par, which="L")
        for x in range(L + 1)
    ]
    tensors = []
    for i in range(L):
        bra, ket = svs[i], svs[i + 1]
        vb = bra.mode_vectors("L")
        vb = np.zeros((0, 0)) if vb is None else vb
        sb = np.asarray(bra.sets("L"), bool)
        vk = ket.mode_vectors("L")
        sk = np.asarray(ket.sets("L"), bool)
        nb = vb.shape[1]
        vb_aug = np.zeros((i + 1, nb + 1), dtype=np.result_type(vb, vk, float))
        vb_aug[:i, :nb] = vb
        vb_aug[i, nb] = 1.0
        O = ref_ut.HT(vb_aug) @ vk  # (nb+1, nk)

        ns_b, ns_k = len(sb), len(sk)
        A = np.zeros((ns_b, 2, ns_k), dtype=O.dtype)
        # bra occupations including the physical orbital: (a, n) pairs
        cnt_b = sb.sum(1)
        cnt_k = sk.sum(1)
        for c in np.unique(np.concatenate([cnt_b, cnt_b + 1])):
            kmask = cnt_k == c
            if not kmask.any():
                continue
            cols = np.stack([np.flatnonzero(s) for s in sk[kmask]]) if c else (
                np.zeros((kmask.sum(), 0), int)
            )
            for n in (0, 1):
                amask = cnt_b + n == c
                if not amask.any():
                    continue
                occ = [np.flatnonzero(s) for s in sb[amask]]
                if n:
                    occ = [np.concatenate([o, [nb]]) for o in occ]
                rows = (
                    np.stack(occ) if c else np.zeros((amask.sum(), 0), int)
                ).astype(int)
                blk = _batched_det(O, rows, cols)
                A[np.ix_(np.flatnonzero(amask), [n], np.flatnonzero(kmask))] = (
                    blk[:, None, :]
                )
        tensors.append(A)
    return tensors, svs, np.asarray(svs[L].schmidt_values, float)


def _chain_state_tensors(tensors, lam_end):
    """Contract the final-cut Schmidt values into the last tensor (the
    state is the lam-weighted sum over the final cut's Schmidt vectors),
    closing the chain on a dim-1 bond; plain contraction of the returned
    list equals the (sub-normalized truncated) state."""
    out = list(tensors)
    out[-1] = (out[-1] @ lam_end)[..., None]
    return out


def _mps_mps_overlap(bra_tensors, ket_tensors):
    E = np.ones((1, 1), dtype=complex)
    for Tb, Tk in zip(bra_tensors, ket_tensors):
        tmp = np.einsum("ab,bnc->anc", E, np.asarray(Tk))
        E = np.einsum("and,anc->dc", np.asarray(Tb).conj(), tmp)
    return complex(E[0, 0])


def _my_exact_tensors(mps):
    return [np.asarray(t) for t in mps.exact_tensors()]


def _fidelity_vs_mine(ref_tensors, mps):
    ket = _my_exact_tensors(mps)
    n_ref = _mps_mps_overlap(ref_tensors, ref_tensors).real
    n_my = _mps_mps_overlap(ket, ket).real
    ov = _mps_mps_overlap(ref_tensors, ket)
    return abs(ov) / np.sqrt(n_ref * n_my)


def _sorted_sv(x):
    x = np.asarray(x, float)
    x = x / np.linalg.norm(x)
    return np.sort(x)[::-1]


def _random_hopping(L, seed):
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(L, L))
    return H + H.T


# ---------------------------------------------------------------------------
# anchor: the dense assembly reproduces ED exactly
# ---------------------------------------------------------------------------


def test_assembly_matches_ed():
    L = 8
    H = _random_hopping(L, 7)
    C, N = ref_sl.correlation_matrix(H)
    tensors, _, lam_end = _ref_dense_A_chain(C, dict(svd_min=1e-8))
    chain = _chain_state_tensors(tensors, lam_end)
    psi = np.ones((1, 1))
    for A in chain:
        psi = np.einsum("pa,anb->pnb", psi, A).reshape(-1, A.shape[2])
    psi = psi[:, 0]
    ev, V = np.linalg.eigh(H)
    psi_exact = slater_statevector(V[:, :N])
    assert fidelity(psi, psi_exact) > 1 - 1e-12


# ---------------------------------------------------------------------------
# Slater parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("L,seed,tp", [(32, 0, dict(svd_min=1e-5, chi_max=64))])
def test_slater_spectrum_parity(L, seed, tp):
    """Per-cut Schmidt spectra: reference SchmidtVectors vs my C_to_MPS."""
    H = _random_hopping(L, seed)
    C, _ = ref_sl.correlation_matrix(H)
    mine = my_sl.C_to_MPS(C.copy(), dict(tp))
    for x in range(1, L):
        ref_sv = ref_sl.SchmidtVectors.from_correlation_matrix(
            C, x, dict(tp), which="L"
        )
        lam_ref = _sorted_sv(ref_sv.schmidt_values)
        lam_my = _sorted_sv(mine.get_SL(x))
        assert len(lam_ref) == len(lam_my), f"cut {x}: chi mismatch"
        np.testing.assert_allclose(lam_my, lam_ref, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize(
    "L,seed,tp,tol",
    [
        (32, 0, dict(svd_min=1e-5, chi_max=64), 1e-8),
        (32, 3, dict(svd_min=1e-6, chi_max=48), 1e-7),
    ],
)
def test_slater_fidelity(L, seed, tp, tol):
    """Full-state fidelity of my truncated MPS vs the reference's."""
    H = _random_hopping(L, seed)
    C, _ = ref_sl.correlation_matrix(H)
    tensors, _, lam_end = _ref_dense_A_chain(C, dict(tp))
    chain = _chain_state_tensors(tensors, lam_end)
    mine = my_sl.C_to_MPS(C.copy(), dict(tp))
    F = _fidelity_vs_mine(chain, mine)
    assert abs(1 - F) < tol, f"fidelity {F}"


@pytest.mark.slow
def test_slater_fidelity_L96():
    L, tp = 96, dict(svd_min=3e-5, chi_max=64)
    H = _random_hopping(L, 11)
    C, _ = ref_sl.correlation_matrix(H)
    tensors, _, lam_end = _ref_dense_A_chain(C, dict(tp))
    chain = _chain_state_tensors(tensors, lam_end)
    mine = my_sl.C_to_MPS(C.copy(), dict(tp))
    F = _fidelity_vs_mine(chain, mine)
    assert abs(1 - F) < 1e-6, f"fidelity {F}"


def test_spinful_correlation_matrix_parity():
    L = 12
    H = _random_hopping(L, 5)
    C, _ = ref_sl.correlation_matrix(H)
    for ph in (True, False):
        ref_C = ref_sl.spinful_correlation_matrix(C, ph)
        my_C = my_sl.spinful_correlation_matrix(C, ph)
        np.testing.assert_allclose(np.asarray(my_C), ref_C, atol=1e-13)


# ---------------------------------------------------------------------------
# Pfaffian parity (spectrum level)
# ---------------------------------------------------------------------------


def _kitaev_H_C(L, t=1.0, mu=3.0, Delta=0.8):
    """Trivial-phase (gapped, |mu| > 2t) Kitaev chain: the reference's
    correlation_matrix rejects near-zero BdG eigenvalues, which the
    topological phase's edge modes produce at these lengths."""
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


@pytest.mark.parametrize("L,tp", [(24, dict(svd_min=1e-5, chi_max=48))])
def test_pfaffian_spectrum_parity(L, tp):
    """Kitaev-chain per-cut Schmidt spectra: reference pfaffian
    SchmidtVectors vs my pfaffian C_to_MPS bond spectra."""
    H = _kitaev_H_C(L)
    C_ref = ref_pf.correlation_matrix(H, basis="C->C")
    C_my = np.asarray(my_pf.correlation_matrix(H, basis="C->C"))
    np.testing.assert_allclose(C_my, C_ref, atol=1e-10)

    mine = my_pf.C_to_MPS(C_my, dict(tp), basis="C")
    for x in range(1, L):
        # which="LR": the reference's which="L" path has an UnboundLocalError
        # (pfaffian.py:918, pR referenced before assignment)
        ref_sv = ref_pf.SchmidtVectors.from_correlation_matrix(
            C_ref, x, dict(tp), basis="C", which="LR"
        )
        lam_ref = _sorted_sv(ref_sv.schmidt_values)
        lam_my = _sorted_sv(mine.get_SL(x))
        assert len(lam_ref) == len(lam_my), f"cut {x}: chi mismatch"
        np.testing.assert_allclose(lam_my, lam_ref, rtol=1e-7, atol=1e-11)


def test_pfaffian_parity_labels():
    """Vacuum parity of the left Schmidt sector, reference vs mine."""
    L = 16
    H = _kitaev_H_C(L, mu=2.6)
    C_ref = ref_pf.correlation_matrix(H, basis="C->M")
    C_my = np.asarray(my_pf.correlation_matrix(H, basis="C->M"))
    np.testing.assert_allclose(C_my, C_ref, atol=1e-10)
    for x in (4, 8, 11):
        # which="LR": the reference's which="L" path has an UnboundLocalError
        # (pfaffian.py:918, pR referenced before assignment)
        ref_m = ref_pf.SchmidtModes.from_correlation_matrix(
            C_ref, x, dict(svd_min=1e-6), basis="M", which="LR"
        )
        my_m = my_pf.SchmidtModes.from_correlation_matrix(
            C_my, x, dict(svd_min=1e-6), basis="M", which="LR"
        )
        assert ref_m.parity("L") == my_m.parity("L"), f"cut {x}"
        assert ref_m.parity("R") == my_m.parity("R"), f"cut {x}"


# ---------------------------------------------------------------------------
# schmidt_utils / utils parity on random inputs
# ---------------------------------------------------------------------------


def test_lowest_sums_parity():
    rng = np.random.default_rng(2)
    for trial in range(4):
        vals = np.abs(rng.normal(size=14)) * 3
        tp = dict(svd_min=np.exp(-rng.uniform(2, 6)), chi_max=int(rng.integers(8, 80)))
        s_ref, sets_ref = ref_su.lowest_sums(
            vals, ref_su.to_stopping_condition(dict(tp)), filled_left=3
        )
        s_my, sets_my = my_su.lowest_sums(
            vals, my_su.to_stopping_condition(dict(tp)), filled_left=3
        )
        np.testing.assert_allclose(np.asarray(s_my), s_ref, atol=1e-12)
        assert np.array_equal(np.asarray(sets_my), sets_ref)


def test_block_svd_parity():
    """block_svd(CLR, vL, vR, e): same degenerate-block completion as the
    reference on a matrix with known singular structure."""
    rng = np.random.default_rng(3)
    s = np.array([0.9, 0.6, 0.6, 0.3, 0.3, 0.3])
    U, _ = np.linalg.qr(rng.normal(size=(10, 6)))
    V, _ = np.linalg.qr(rng.normal(size=(8, 6)))
    CLR = (U * s) @ V.T
    # scramble the singular vectors by a shared rotation within each
    # degenerate block: vL^dag CLR vR stays block diagonal, e delineates
    vL, vR = U.copy(), V.copy()
    for sl in (slice(1, 3), slice(3, 6)):
        Q, _ = np.linalg.qr(rng.normal(size=(sl.stop - sl.start,) * 2))
        vL[:, sl] = vL[:, sl] @ Q
        vR[:, sl] = vR[:, sl] @ Q
    ref_L, ref_R = ref_ut.block_svd(CLR, vL.copy(), vR.copy(), s, 1e-8)
    out = my_ut.block_svd(CLR, vL.copy(), vR.copy(), s, 1e-8)
    my_L, my_R = (np.asarray(o) for o in out[:2])
    for got_L, got_R in ((ref_L, ref_R), (my_L, my_R)):
        D = got_L.conj().T @ CLR @ got_R
        np.testing.assert_allclose(D, np.diag(s), atol=1e-10)
    # within exactly-degenerate blocks the completed vectors are unique
    # only up to a further rotation; compare the spanned subspaces
    for sl in (slice(0, 1), slice(1, 3), slice(3, 6)):
        for mine, ref in ((my_L, ref_L), (my_R, ref_R)):
            P_my = mine[:, sl] @ mine[:, sl].conj().T
            P_ref = ref[:, sl] @ ref[:, sl].conj().T
            np.testing.assert_allclose(P_my, P_ref, atol=1e-10)
