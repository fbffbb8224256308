"""Tests for the device kernels (ops/linalg.py, ops/pfaffian.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from temfpy_tpu.ops.linalg import (
    eigh_blocks,
    batched_det_gather,
    block_diag_identity_pad,
    block_svd,
)
from temfpy_tpu.ops.pfaffian import (
    batched_pfaffian,
    batched_pfaffian_gather,
    pfaffian_numpy,
    symplectic_pad,
)
from temfpy_tpu.utils import HT


rng = np.random.default_rng(42)


def random_corr(L, seed=0):
    """Random correlation matrix (Hermitian, spectrum in [0, 1])."""
    r = np.random.default_rng(seed)
    H = r.normal(size=(L, L)) + 1j * r.normal(size=(L, L))
    H = H + HT(H)
    e, v = np.linalg.eigh(H)
    occ = v[:, : L // 2]
    return occ @ HT(occ)


# ---------------------------------------------------------------- pfaffian


def test_pfaffian_closed_forms():
    A = np.zeros((2, 2), complex)
    A[0, 1], A[1, 0] = 3.7 + 1j, -(3.7 + 1j)
    assert abs(complex(batched_pfaffian(A[None])[0]) - (3.7 + 1j)) < 1e-12

    B = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    B = B - B.T
    expected = B[0, 1] * B[2, 3] - B[0, 2] * B[1, 3] + B[0, 3] * B[1, 2]
    assert abs(complex(batched_pfaffian(B[None])[0]) - expected) < 1e-12


@pytest.mark.parametrize("n", [2, 4, 8, 12, 20])
def test_pfaffian_squared_is_det(n):
    A = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    A = A - A.T
    pf = complex(batched_pfaffian(A[None])[0])
    det = np.linalg.det(A)
    assert abs(pf**2 - det) / max(abs(det), 1) < 1e-9


def test_pfaffian_batch_matches_numpy():
    As = rng.normal(size=(7, 6, 6)) + 1j * rng.normal(size=(7, 6, 6))
    As = As - As.swapaxes(-1, -2)
    out = np.asarray(batched_pfaffian(As))
    ref = np.array([pfaffian_numpy(A) for A in As])
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


def test_pfaffian_zero():
    A = np.zeros((4, 4))
    assert complex(batched_pfaffian(A[None])[0]) == 0


def test_symplectic_pad_identity():
    A = rng.normal(size=(6, 6))
    A = A - A.T
    Ap = np.asarray(symplectic_pad(jnp.asarray(A), 4))
    assert abs(pfaffian_numpy(Ap) - pfaffian_numpy(A)) < 1e-12


def test_pfaffian_gather():
    m = 8
    N = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    N = N - N.T
    # pairs: ket indices then bra indices; tail padding in bra via sentinels
    ket = np.array([[0, 1], [2, 3]], dtype=np.int32)
    bra = np.array([[4, 5], [6, 7], [m, m + 1]], dtype=np.int32)  # last = padded
    out = np.asarray(batched_pfaffian_gather(jnp.asarray(N), bra, ket, pad_slots=2))
    for i, b in enumerate([[4, 5], [6, 7], None]):
        for j, k in enumerate([[0, 1], [2, 3]]):
            ix = list(k) + (list(b) if b else [])
            sub = N[np.ix_(ix, ix)]
            np.testing.assert_allclose(out[i, j], pfaffian_numpy(sub), atol=1e-10)


# ---------------------------------------------------------------- eigh_blocks


def test_eigh_blocks_left_right():
    L = 16
    C = random_corr(L, seed=3)
    sizes = [1, 5, 9, 16]
    e, v = eigh_blocks(jnp.asarray(C), sizes, "L")
    e, v = np.asarray(e), np.asarray(v)
    for i, x in enumerate(sizes):
        ref = np.linalg.eigvalsh(C[:x, :x])
        np.testing.assert_allclose(e[i, :x], ref, atol=1e-10)
        assert np.all(e[i, x:] > 1.5)  # padding eigenvalues
        # eigenvectors confined to the block and accurate
        resid = C[:x, :x] @ v[i, :x, :x] - v[i, :x, :x] * e[i, :x]
        assert np.abs(resid).max() < 1e-10
        if x < L:
            assert np.abs(v[i, x:, :x]).max() < 1e-12

    e, v = eigh_blocks(jnp.asarray(C), sizes, "R")
    e, v = np.asarray(e), np.asarray(v)
    for i, x in enumerate(sizes):
        ref = np.linalg.eigvalsh(C[L - x :, L - x :])
        np.testing.assert_allclose(e[i, :x], ref, atol=1e-10)
        resid = C[L - x :, L - x :] @ v[i, L - x :, :x] - v[i, L - x :, :x] * e[i, :x]
        assert np.abs(resid).max() < 1e-10


def test_eigh_blocks_chunked():
    L = 10
    C = random_corr(L, seed=5)
    sizes = list(range(1, L + 1))
    e1, v1 = eigh_blocks(jnp.asarray(C), sizes, "L")
    e2, v2 = eigh_blocks(jnp.asarray(C), sizes, "L", chunk=3)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-12)


# ---------------------------------------------------------------- det gather


def test_batched_det_gather_mixed_sizes():
    m = 7
    M = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    # width-3 index lists; second row uses only 2 real + 1 padding slot
    bra = np.array([[0, 1, 2], [3, 4, m + 2]], dtype=np.int32)
    ket = np.array([[2, 3, 4], [5, 6, m + 2]], dtype=np.int32)
    D = np.asarray(batched_det_gather(jnp.asarray(M), bra, ket))
    np.testing.assert_allclose(
        D[0, 0], np.linalg.det(M[np.ix_([0, 1, 2], [2, 3, 4])]), atol=1e-12
    )
    np.testing.assert_allclose(
        D[1, 1], np.linalg.det(M[np.ix_([3, 4], [5, 6])]), atol=1e-12
    )
    # mixed real-width pairs are not used by callers (charge blocks align),
    # but the identity extension still yields the rectangular-consistent 0
    # block structure; just check nothing crashes / NaNs.
    assert np.isfinite(D).all()


def test_batched_det_gather_empty_width():
    M = jnp.asarray(rng.normal(size=(4, 4)))
    D = batched_det_gather(M, np.zeros((2, 0), np.int32), np.zeros((3, 0), np.int32))
    np.testing.assert_allclose(np.asarray(D), np.ones((2, 3)))


def test_block_diag_identity_pad():
    M = rng.normal(size=(3, 3))
    P = np.asarray(block_diag_identity_pad(jnp.asarray(M), 2))
    assert P.shape == (5, 5)
    np.testing.assert_allclose(np.linalg.det(P), np.linalg.det(M), rtol=1e-12)


# ---------------------------------------------------------------- block_svd


def test_block_svd_degenerate_completion():
    """Construct C_LR with degenerate singular values; block_svd must rotate
    almost-singular vectors into true singular vectors."""
    r = np.random.default_rng(7)
    n, k = 8, 4
    # true singular vectors and degenerate values
    A = r.normal(size=(n, k)) + 1j * r.normal(size=(n, k))
    QL, _ = np.linalg.qr(A)
    B = r.normal(size=(n, k)) + 1j * r.normal(size=(n, k))
    QR, _ = np.linalg.qr(B)
    s = np.array([0.9, 0.9, 0.3, 0.3])
    C = (QL * s) @ HT(QR)
    e = np.array([0.5, 0.5, 0.1, 0.1])  # degeneracy pattern matching s

    # scramble within degenerate pairs with block-diagonal unitaries
    def rand_u(m):
        X = r.normal(size=(m, m)) + 1j * r.normal(size=(m, m))
        Q, _ = np.linalg.qr(X)
        return Q

    UL = np.zeros((k, k), complex)
    UR = np.zeros((k, k), complex)
    UL[:2, :2], UL[2:, 2:] = rand_u(2), rand_u(2)
    UR[:2, :2], UR[2:, 2:] = rand_u(2), rand_u(2)
    vL = QL @ UL
    vR = QR @ UR

    vL2, vR2 = block_svd(jnp.asarray(C), vL, vR, e, degeneracy_tol=1e-10)
    vL2, vR2 = np.asarray(vL2), np.asarray(vR2)
    # completed vectors must diagonalise C with singular values s
    S = HT(vL2) @ C @ vR2
    np.testing.assert_allclose(S, np.diag(s), atol=1e-10)


def test_block_svd_empty():
    C = jnp.zeros((3, 4))
    vL, vR = block_svd(C, np.zeros((3, 0)), np.zeros((4, 0)), np.zeros(0))
    assert vL.shape == (3, 0) and vR.shape == (4, 0)


# ---------------------------------------------------------------------------
# TPU-first batch-last kernels and one-hot submatrix selection
# (on the CPU test backend these exercise the same code paths the TPU takes;
# exactness of the one-hot trick is backend-independent: every output element
# is a single moved value)
# ---------------------------------------------------------------------------


def test_lu_det_batch_last_matches_numpy():
    from temfpy_tpu.ops.linalg import _lu_det_batch_last

    rng = np.random.default_rng(7)
    for n in (2, 16, 32):
        A = rng.normal(size=(40, n, n))
        got = np.asarray(_lu_det_batch_last(jnp.asarray(A.transpose(1, 2, 0))))
        ref = np.linalg.det(A)
        np.testing.assert_allclose(got, ref, rtol=1e-10)
        Ac = A + 1j * rng.normal(size=A.shape)
        gotc = np.asarray(_lu_det_batch_last(jnp.asarray(Ac.transpose(1, 2, 0))))
        np.testing.assert_allclose(gotc, np.linalg.det(Ac), rtol=1e-10)


def test_pfaffian_batch_last_matches_host():
    from temfpy_tpu.ops.pfaffian import _pfaffian_batch_last, pfaffian_numpy

    rng = np.random.default_rng(8)
    for n in (2, 8, 16):
        B = rng.normal(size=(30, n, n)) + 1j * rng.normal(size=(30, n, n))
        A = B - B.transpose(0, 2, 1)
        got = np.asarray(_pfaffian_batch_last(jnp.asarray(A.transpose(1, 2, 0))))
        ref = np.array([pfaffian_numpy(a) for a in A])
        np.testing.assert_allclose(got, ref, rtol=1e-10)
    # skew matrix with a decoupled zero mode: Pf is exactly 0
    A = rng.normal(size=(8, 8))
    A = A - A.T
    A[3, :] = A[:, 3] = 0.0
    got = np.asarray(_pfaffian_batch_last(jnp.asarray(A[:, :, None])))
    assert got[0] == 0.0


def test_onehot_select_bit_exact():
    from temfpy_tpu.ops.linalg import _onehot_select

    rng = np.random.default_rng(9)
    m, w, P = 37, 6, 50
    for dtype in (np.float64, np.complex128):
        M = rng.normal(size=(m, m)).astype(dtype)
        if np.iscomplexobj(M):
            M = M + 1j * rng.normal(size=(m, m))
        ib = rng.integers(0, m, size=(P, w))
        ik = rng.integers(0, m, size=(P, w))
        ref = np.asarray(M)[ib[:, :, None], ik[:, None, :]]
        got = np.asarray(_onehot_select(jnp.asarray(M), jnp.asarray(ib), jnp.asarray(ik), cross=False))
        assert np.array_equal(got, ref), f"one-hot selection not exact for {dtype}"
    # cross form
    M = rng.normal(size=(m, m))
    ib = rng.integers(0, m, size=(11, w))
    ik = rng.integers(0, m, size=(13, w))
    ref = M[ib[:, None, :, None], ik[None, :, None, :]]
    got = np.asarray(_onehot_select(jnp.asarray(M), jnp.asarray(ib), jnp.asarray(ik), cross=True))
    assert np.array_equal(got, ref)


def test_pfaffian_split_complex_matches_host():
    from temfpy_tpu.ops.pfaffian import batched_pfaffian_split, pfaffian_numpy

    rng = np.random.default_rng(11)
    for n in (2, 8, 24):
        B = rng.normal(size=(25, n, n)) + 1j * rng.normal(size=(25, n, n))
        A = B - B.transpose(0, 2, 1)
        pr, pi = batched_pfaffian_split(jnp.asarray(A.real), jnp.asarray(A.imag))
        got = np.asarray(pr) + 1j * np.asarray(pi)
        ref = np.array([pfaffian_numpy(a) for a in A])
        np.testing.assert_allclose(got, ref, rtol=1e-10)
