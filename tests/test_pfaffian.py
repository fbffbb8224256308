"""End-to-end tests of the Pfaffian/BdG -> MPS pipeline against exact
diagonalization (cf. reference examples/pfaffian.py)."""

import numpy as np
import pytest

import temfpy_tpu.testing as tst
from temfpy_tpu import pfaffian
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



def majorana_random_H(L, seed=0, corr_range=3.0):
    """Random local Majorana Hamiltonian i(M - M^T) (cf. reference
    examples/pfaffian.py)."""
    r = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(2 * L), np.arange(2 * L), indexing="ij")
    scale = np.exp(-abs(x - y) / corr_range)
    M = r.normal(size=(2 * L, 2 * L)) * scale
    return 1j * (M - M.T)


def kitaev_H_C(L, t=1.0, mu=0.5, Delta=0.8):
    """Kitaev chain in the complex-fermion Nambu layout
    (rows/cols interleave c^dag_i, c_i)."""
    h = np.zeros((L, L))
    D = np.zeros((L, L))
    for i in range(L - 1):
        h[i, i + 1] = h[i + 1, i] = -t
        D[i, i + 1] = Delta
        D[i + 1, i] = -Delta
    h -= mu * np.eye(L)
    # Nambu matrix: coefficient blocks of (c^dag c, c^dag c^dag; c c, c c^dag)
    H = np.zeros((2 * L, 2 * L), dtype=complex)
    H[::2, ::2] = h
    H[1::2, 1::2] = -h.T
    H[::2, 1::2] = D
    H[1::2, ::2] = -D.conj()
    return H, h, D


def nambu_from_quadratic(h, D):
    """Nambu single-particle matrix (complex-fermion layout, "C") for
    H = sum h_ij c^dag_i c_j + 1/2 sum (D_ij c^dag_i c^dag_j + h.c.)."""
    L = len(h)
    H = np.zeros((2 * L, 2 * L), dtype=complex)
    H[::2, ::2] = h / 2 + h.conj().T / 2
    H[1::2, 1::2] = -(h / 2 + h.conj().T / 2).T
    H[::2, 1::2] = D
    H[1::2, ::2] = -D.conj()
    return H / 1.0


def test_basis_roundtrip():
    r = np.random.default_rng(0)
    v = r.normal(size=(8, 3)) + 1j * r.normal(size=(8, 3))
    np.testing.assert_allclose(
        np.asarray(pfaffian.vector_M2C(pfaffian.vector_C2M(v))), v, atol=1e-13
    )
    H = r.normal(size=(8, 8)) + 1j * r.normal(size=(8, 8))
    np.testing.assert_allclose(
        np.asarray(pfaffian.matrix_M2C(pfaffian.matrix_C2M(H))), H, atol=1e-13
    )


def test_assert_nambu_majorana():
    L = 4
    H = majorana_random_H(L, seed=1)
    out = pfaffian.assert_nambu_hamiltonian(H, "M")
    np.testing.assert_allclose(np.asarray(out), H, atol=1e-12)
    with np.testing.assert_raises(AssertionError):
        bad = H.copy()
        bad[0, 0] = 0.5  # real diagonal not allowed for Hamiltonian
        pfaffian.assert_nambu_hamiltonian(bad, "M")


def test_correlation_matrix_bases():
    L = 5
    H = majorana_random_H(L, seed=2)
    C_M = pfaffian.correlation_matrix(H, basis="M->M")
    C_C = pfaffian.correlation_matrix(H, basis="M->C")
    np.testing.assert_allclose(
        np.asarray(pfaffian.matrix_C2M(C_C)), C_M, atol=1e-10
    )
    # Nambu structure of the complex-fermion C
    pfaffian.assert_nambu_correlation(np.asarray(C_C), "C")


def test_parity_function():
    # trivial vacuum (V = 0) is even
    assert pfaffian.parity(np.zeros((3, 3))) == 0
    # fully paired 4x4 with two degenerate SVs in (0,1): even
    r = np.random.default_rng(3)
    # construct V with singular values (0.6, 0.6, 0.2, 0.2)
    U, _ = np.linalg.qr(r.normal(size=(4, 4)))
    W, _ = np.linalg.qr(r.normal(size=(4, 4)))
    V = U @ np.diag([0.6, 0.6, 0.2, 0.2]) @ W
    assert pfaffian.parity(V) == 0
    V = U @ np.diag([1.0, 0.6, 0.6, 0.0]) @ W
    assert pfaffian.parity(V) == 1


def exact_bdg_ground_state(L, h, D):
    """Dense ground state of the quadratic BdG Hamiltonian."""
    Hmb = oracles.quadratic_hamiltonian(L, h, D)
    return oracles.ground_state(Hmb)


@pytest.mark.parametrize("mu", [0.5, 2.0])
def test_kitaev_fidelity(mu):
    """Kitaev chain: MPS from the Pfaffian pipeline vs exact ground state."""
    L = 6
    H, h, D = kitaev_H_C(L, mu=mu)
    mps = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="C")
    psi_mps = mps.to_statevector()
    psi_exact = exact_bdg_ground_state(L, h, D)
    f = oracles.fidelity(psi_exact, psi_mps)
    assert f > 1 - 1e-9, f"fidelity {f}"
    assert abs(mps.norm_squared() - 1) < 1e-9


def test_majorana_random_fidelity():
    """Random Majorana Hamiltonian: correlators from the MPS vs input C
    (the reference example's check) and parity of the state."""
    L = 6
    H = majorana_random_H(L, seed=5)
    mps = pfaffian.H_to_MPS(H, {"chi_max": 128}, basis="M")
    C = pfaffian.correlation_matrix(H, basis="M->C")
    C = np.asarray(C)

    CdC = mps.correlation_function("Cd", "C").T
    dev1 = np.abs(CdC - C[::2, ::2]).max()
    CC = mps.correlation_function("C", "C").T
    dev2 = np.abs(CC - C[::2, 1::2]).max()
    assert dev1 < 1e-8, f"<c+c> deviation {dev1}"
    assert dev2 < 1e-8, f"<cc> deviation {dev2}"


def test_bond_parity_charges():
    L = 6
    H = majorana_random_H(L, seed=7)
    mps = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="M")
    for i in range(L):
        T = np.asarray(mps._B[i])
        qL = mps.q_bond[i][:, None, None]
        qp = mps.sites[i].charges[None, :, None]
        qR = mps.q_bond[i + 1][None, None, :]
        bad = (qL + qp - qR - mps.qtotal[i]) % 2 != 0
        assert np.abs(T[bad]).max(initial=0.0) < 1e-10


def test_canonical_forms_pfaffian():
    L = 6
    H = majorana_random_H(L, seed=9)
    mps = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="M")
    c = mps.form.index("B")
    for i in range(L):
        T = np.asarray(mps._B[i])
        if i < c:
            g = np.einsum("anb,anc->bc", T.conj(), T)
        else:
            g = np.einsum("anb,cnb->ac", T, T.conj())
        np.testing.assert_allclose(g, np.eye(len(g)), atol=1e-8)


def test_schmidt_modes_halves():
    """lambda = 1/2 machinery: a dimerized Kitaev chain (t = Delta inside
    dimers only) has correlation eigenvalue exactly 1/2 at cuts inside a
    dimer, exercising the half-mode realification/SVD/shuffle path."""
    L = 6
    h = np.zeros((L, L))
    D = np.zeros((L, L))
    for i in range(L):  # periodic ring at the sweet spot: gapped, kh = 1
        j = (i + 1) % L
        h[i, j] = h[j, i] = -1.0
        D[i, j] += 1.0
        D[j, i] += -1.0
    H = nambu_from_quadratic(h, D)
    modes = pfaffian.SchmidtModes.from_correlation_matrix(
        pfaffian.correlation_matrix(H, basis="C->M"), 3, {"chi_max": 64}, basis="M"
    )
    assert np.isclose(modes.e[-1], 0.5, atol=1e-10), "expected a 1/2 mode"
    mps = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="C")
    psi_exact = exact_bdg_ground_state(L, h, D)
    f = oracles.fidelity(psi_exact, mps.to_statevector())
    assert f > 1 - 1e-9, f"fidelity {f}"


def test_pfaffian_imps_split_backend(monkeypatch):
    """The Pfaffian iMPS route (gauge fixing via charged Procrustes on
    complex overlap matrices) must run with device complex DISABLED — the
    TPU constraint (complex data stays host-side throughout)."""
    monkeypatch.setenv("TEMFPY_TPU_DEVICE_COMPLEX", "0")

    def kitaev(L, t=1.0, d=1.0, mu=3.0):
        H = np.zeros((2 * L, 2 * L), complex)
        for i in range(L):
            H[2 * i, 2 * i] = -mu / 2
            H[2 * i + 1, 2 * i + 1] = mu / 2
        for i in range(L - 1):
            H[2 * i, 2 * (i + 1)] += -t / 2
            H[2 * (i + 1), 2 * i] += -t / 2
            H[2 * i + 1, 2 * (i + 1) + 1] += t / 2
            H[2 * (i + 1) + 1, 2 * i + 1] += t / 2
            H[2 * i, 2 * (i + 1) + 1] += d / 2
            H[2 * (i + 1) + 1, 2 * i] += d / 2
            H[2 * i + 1, 2 * (i + 1)] += -d / 2
            H[2 * (i + 1), 2 * i + 1] += -d / 2
        return H + H.conj().T - np.diag(np.diag(H).real)

    imps, err = pfaffian.H_to_iMPS(
        kitaev(16), kitaev(18), {"chi_max": 32}, 2, 8, basis="C"
    )
    assert isinstance(imps._B[0], np.ndarray)  # complex stays on the host
    assert err.left_unitary < 1e-3
    n = imps.expectation_value("N").real
    assert np.all((n > 0) & (n < 1))


def test_kitaev_fidelity_split_backend(monkeypatch):
    """The split-complex (TPU-constraint) fill path — packed pair tables,
    device-derived index rows — reproduces the exact ground state."""
    monkeypatch.setenv("TEMFPY_TPU_DEVICE_COMPLEX", "0")
    L = 6
    H, h, D = kitaev_H_C(L, mu=0.5)
    mps = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="C")
    psi_exact = exact_bdg_ground_state(L, h, D)
    f = oracles.fidelity(psi_exact, mps.to_statevector())
    assert f > 1 - 1e-9, f"fidelity {f}"
    assert abs(mps.norm_squared() - 1) < 1e-9


def test_packed_pair_pfaffians_match_index_path():
    """batched_pfaffian_pairs_packed_split (one fused int32 upload,
    on-device index derivation) is bit-identical to the explicit
    (P, width) index-matrix path."""
    import jax.numpy as jnp

    from temfpy_tpu.ops.pfaffian import (
        batched_pfaffian_pairs_packed_split,
        batched_pfaffian_pairs_split,
    )

    rng = np.random.default_rng(0)
    m = 12
    A = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    A = A - A.T
    nb, nk = 9, 7
    sets_b = rng.random((nb, m)) < 0.3
    sets_k = rng.random((nk, m)) < 0.3
    cnt_b = sets_b.sum(1)
    cnt_k = sets_k.sum(1)
    rows, cols = [], []
    for p in (0, 1):
        r = np.nonzero(cnt_b % 2 == p)[0]
        c = np.nonzero(cnt_k % 2 == p)[0]
        rows.append(np.repeat(r, len(c)))
        cols.append(np.tile(c, len(r)))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    P = len(rows)
    width = int(cnt_b.max() + cnt_k.max())
    width = max(4, -(-width // 4) * 4)

    def positions(sets):
        return np.argsort(~sets, axis=1, kind="stable").astype(np.int32)

    pos_b = positions(sets_b)
    pos_k = positions(sets_k)

    # explicit index rows (ket positions, bra positions, sentinel tail)
    nk_p = cnt_k[cols]
    total = nk_p + cnt_b[rows]
    idx = np.empty((P, width), np.int32)
    slot = np.arange(width)[None, :]
    idx[:] = m + (slot - total[:, None])
    kslot = np.minimum(slot, pos_k.shape[1] - 1)
    idx = np.where(
        slot < nk_p[:, None],
        np.take_along_axis(pos_k[cols], kslot, 1), idx,
    )
    bslot = np.clip(slot - nk_p[:, None], 0, pos_b.shape[1] - 1)
    take_b = (slot >= nk_p[:, None]) & (slot < total[:, None])
    idx = np.where(take_b, np.take_along_axis(pos_b[rows], bslot, 1), idx)
    P_b = max(256, 1 << int(np.ceil(np.log2(P))))
    pad_row = m + np.arange(width, dtype=np.int32)
    idx = np.concatenate([idx, np.broadcast_to(pad_row, (P_b - P, width))])
    vr0, vi0 = batched_pfaffian_pairs_split(A.real, A.imag, idx,
                                            pad_slots=width)

    def pow2(n, lo):
        b = lo
        while b < n:
            b *= 2
        return b

    wt_b = min(pos_b.shape[1], width)
    wt_k = min(pos_k.shape[1], width)
    R_b = pow2(nb + 1, 32)
    K_b = pow2(nk + 1, 32)
    pb = np.zeros((R_b, wt_b), np.int32)
    pb[:nb] = pos_b[:, :wt_b]
    pk = np.zeros((K_b, wt_k), np.int32)
    pk[:nk] = pos_k[:, :wt_k]
    cb = np.zeros(R_b, np.int32)
    cb[:nb] = cnt_b
    ck = np.zeros(K_b, np.int32)
    ck[:nk] = cnt_k
    pr = np.full(P_b, R_b - 1, np.int32)
    pr[:P] = rows
    pc = np.full(P_b, K_b - 1, np.int32)
    pc[:P] = cols
    for chunk in (None, 128):
        vr1, vi1 = batched_pfaffian_pairs_packed_split(
            A.real, A.imag, pb, pk, cb, ck, pr, pc,
            width=width, pad_slots=width, chunk=chunk,
        )
        assert float(jnp.max(jnp.abs(vr0 - vr1))) == 0.0
        assert float(jnp.max(jnp.abs(vi0 - vi1))) == 0.0


def test_unchecked_complex_assembly_matches_checked(monkeypatch):
    """TEST_ACTION='pass' routes the complex N assembly through the fused
    jitted kernel (det-based norm guard); the MPS must match the checked
    path to numerical precision."""
    from temfpy_tpu import testing as tst

    rng = np.random.default_rng(21)
    L = 6
    A = rng.normal(size=(2 * L, 2 * L))
    H = 1j * (A - A.T)
    mps_checked = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="M")
    monkeypatch.setattr(tst, "TEST_ACTION", "pass")
    mps_fast = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="M")
    assert abs(abs(mps_checked.overlap(mps_fast)) - 1) < 1e-10
    for a, b in zip(mps_checked._B, mps_fast._B):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-10


def test_grouped_overlap_split_production(monkeypatch):
    """Production mode + split planes routes the per-site overlap kernels
    through the grouped (vmapped, fused-upload) dispatch; fidelity and
    norm must be unaffected."""
    from temfpy_tpu import testing as tst

    monkeypatch.setenv("TEMFPY_TPU_DEVICE_COMPLEX", "0")
    monkeypatch.setattr(tst, "TEST_ACTION", "pass")
    L = 6
    H, h, D = kitaev_H_C(L, mu=0.5)
    mps = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="C")
    f = oracles.fidelity(exact_bdg_ground_state(L, h, D), mps.to_statevector())
    assert f > 1 - 1e-9, f"fidelity {f}"
    assert abs(mps.norm_squared() - 1) < 1e-9
