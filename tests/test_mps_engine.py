"""Unit tests of the charge-aware MPS engine itself (canonical forms,
charged factorizations, serialization, infinite canonicalization)."""

import numpy as np
import jax.numpy as jnp
import pytest

from temfpy_tpu.mps import (
    MPS,
    ChargeInfo,
    FermionSite,
    SpinHalfSite,
    charged_qr,
    charged_svd,
    load_mps,
    save_mps,
)


rng = np.random.default_rng(0)


def random_charged_matrix(q_row, q_col, chinfo, qtotal=0, scale=1.0):
    """Dense random matrix obeying the charge rule q_row == q_col + qtotal."""
    M = np.zeros((len(q_row), len(q_col)), dtype=complex)
    ok = chinfo.equal(np.asarray(q_row)[:, None], np.asarray(q_col)[None, :] + qtotal)
    vals = rng.normal(size=M.shape) + 1j * rng.normal(size=M.shape)
    M[ok] = vals[ok] * scale
    return M


def test_charged_svd_roundtrip():
    chinfo = ChargeInfo(1, "N")
    q_row = np.array([0, 0, 1, 1, 2, 2, 2])
    q_col = np.array([0, 1, 1, 2, 2])
    M = random_charged_matrix(q_row, q_col, chinfo)
    U, S, Vh, q_mid, err = charged_svd(M, q_row, q_col, chinfo)
    rec = np.asarray(U) @ np.diag(S) @ np.asarray(Vh)
    np.testing.assert_allclose(rec, M, atol=1e-12)
    assert err < 1e-20
    # U, Vh conserve charge with the new bond labels
    ok = chinfo.equal(q_row[:, None], q_mid[None, :])
    assert np.abs(np.asarray(U)[~ok]).max(initial=0) < 1e-14


def test_charged_svd_truncation():
    chinfo = ChargeInfo(1, "N")
    q = np.array([0, 0, 1, 1])
    M = random_charged_matrix(q, q, chinfo)
    U, S, Vh, q_mid, err = charged_svd(M, q, q, chinfo, chi_max=2)
    assert len(S) == 2
    assert err > 0


def test_charged_qr_roundtrip():
    chinfo = ChargeInfo(2, "parity")
    q_row = np.array([0, 1, 0, 1, 0])
    q_col = np.array([1, 0, 1])
    M = random_charged_matrix(q_row, q_col, chinfo, qtotal=1)
    Q, R, q_mid = charged_qr(M, q_row, q_col, chinfo, qtotal=1)
    np.testing.assert_allclose(np.asarray(Q) @ np.asarray(R), M, atol=1e-12)
    g = np.asarray(Q).conj().T @ np.asarray(Q)
    np.testing.assert_allclose(g, np.eye(len(g)), atol=1e-12)


def random_mps(L=6, chi=5, d=2, seed=3):
    r = np.random.default_rng(seed)
    site = SpinHalfSite(None)
    Bs = []
    chis = [1] + [chi] * (L - 1) + [1]
    for i in range(L):
        Bs.append(r.normal(size=(chis[i], d, chis[i + 1])))
    SVs = [None] * (L + 1)
    SVs[0] = np.ones(1)
    SVs[L] = np.ones(1)
    return MPS([site] * L, Bs, SVs, form=[None] * L, bc="finite")


def test_canonical_form_finite_preserves_state():
    mps = random_mps()
    # raw product statevector before canonicalisation
    psi_raw = jnp.ones((1, 1))
    for B in mps._B:
        psi_raw = jnp.einsum("pa,anb->pnb", psi_raw, B).reshape(-1, B.shape[2])
    psi_raw = np.asarray(psi_raw[:, 0])
    mps.canonical_form_finite(cutoff=1e-13)
    psi = mps.to_statevector() * mps.norm
    np.testing.assert_allclose(psi, psi_raw, atol=1e-10)
    # all right-canonical
    for i in range(mps.L):
        B = np.asarray(mps._B[i])
        g = np.einsum("anb,cnb->ac", B, B.conj())
        np.testing.assert_allclose(g, np.eye(len(g)), atol=1e-10)
    # Schmidt values normalised per bond
    for i in range(1, mps.L):
        assert abs(np.linalg.norm(mps._S[i]) - 1) < 1e-12


def test_canonical_form_infinite():
    """Random gauge transform of an iMPS; canonicalisation must restore a
    right-canonical cell with the correct Schmidt spectrum."""
    # build a known canonical iMPS: two-site unit cell of the transverse-
    # field-Ising-like form; use a random MPS canonicalised by brute force
    r = np.random.default_rng(5)
    chi, d = 4, 2
    site = SpinHalfSite(None)
    T = [r.normal(size=(chi, d, chi)) for _ in range(2)]
    m = MPS([site] * 2, T, [None, None, None], form=[None, None], bc="infinite")
    m.canonical_form_infinite()
    # right canonical?
    for B in m._B:
        g = np.einsum("anb,cnb->ac", np.asarray(B), np.asarray(B).conj())
        np.testing.assert_allclose(g, np.eye(len(g)), atol=1e-8)
    S0 = m._S[0].copy()
    # transfer-matrix left fixed point should be diag(S^2)
    E = np.diag(S0**2).astype(complex)
    for B in m._B:
        B = np.asarray(B)
        E = np.einsum("ab,anc,bnd->cd", E, B, B.conj())
    np.testing.assert_allclose(E, np.diag(S0**2), atol=1e-8)

    # now gauge-scramble the cell and re-canonicalise: same entanglement spectrum
    G = r.normal(size=(chi, chi)) + 0.1 * np.eye(chi)
    Ginv = np.linalg.inv(G)
    T2 = [
        np.einsum("ab,bnc->anc", G, np.asarray(m._B[0])),
        np.einsum("anb,bc->anc", np.asarray(m._B[1]), Ginv),
    ]
    m2 = MPS([site] * 2, T2, [None, None, None], form=[None, None], bc="infinite")
    m2.canonical_form_infinite()
    np.testing.assert_allclose(
        np.sort(m2._S[0])[::-1][: len(S0)], np.sort(S0)[::-1], atol=1e-7
    )


def test_save_load_roundtrip(tmp_path):
    from temfpy_tpu import slater

    H = np.diag(-np.ones(5), 1)
    H = H + H.T
    mps = slater.H_to_MPS(H, {"chi_max": 16})
    path = str(tmp_path / "state.npz")
    save_mps(path, mps)
    back = load_mps(path)
    assert back.L == mps.L and back.bc == mps.bc
    ov = mps.overlap(back)
    assert abs(abs(ov) - 1) < 1e-12
    for q1, q2 in zip(mps.q_bond, back.q_bond):
        np.testing.assert_array_equal(q1, q2)
    assert isinstance(back.sites[0], FermionSite)


def test_expectation_value_density():
    from temfpy_tpu import slater

    L = 8
    H = np.diag(-np.ones(L - 1), 1)
    H = H + H.T
    mps = slater.H_to_MPS(H, {"chi_max": 32})
    C, _ = slater.correlation_matrix(H)
    n_mps = mps.expectation_value("N").real
    np.testing.assert_allclose(n_mps, np.diag(np.asarray(C)).real, atol=1e-8)


def test_group_sites_extract_segment_gauge():
    """The TeNPy-surface methods the reference consumes: group_sites,
    extract_segment, gauge_total_charge (SURVEY section 2.2)."""
    import numpy as np

    from temfpy_tpu import slater

    H = np.zeros((8, 8))
    for i in range(7):
        H[i, i + 1] = H[i + 1, i] = -1.0
    mps = slater.H_to_MPS(H, {"chi_max": 32})

    g = mps.group_sites(2)
    assert g.L == 4 and g.sites[0].d == 4
    # the grouped state is the same state
    np.testing.assert_allclose(
        np.abs(np.vdot(mps.to_statevector(), g.to_statevector())), 1.0,
        atol=1e-10,
    )
    # grouped operators compose by Kronecker product
    op = g.sites[0].get_op("N Id")
    assert op.shape == (4, 4)

    seg = mps.extract_segment(2, 5)
    assert seg.L == 4 and seg.finite
    # right-canonical tensors transfer verbatim
    np.testing.assert_allclose(
        np.asarray(seg._B[0]), np.asarray(mps.get_B(2, "B")), atol=1e-12
    )

    before_phys = mps.get_total_charge(only_physical=True)
    mps.gauge_total_charge(3)
    assert mps.get_total_charge() == 3
    assert mps.get_total_charge(only_physical=True) == before_phys
    # charge rules still hold on every tensor
    for i in range(mps.L):
        B = np.asarray(mps._B[i])
        qL = mps.q_bond[i][:, None, None]
        qp = np.asarray(mps.sites[i].charges)[None, :, None]
        qR = mps.q_bond[i + 1][None, None, :]
        bad = (qL + qp - qR - mps.qtotal[i]) != 0
        if bad.any():
            assert np.abs(B[bad]).max() < 1e-12
