"""Exact-diagonalization oracles for small systems.

The reference library cannot run here (TeNPy/pfapack are not installed), so
correctness is certified against exact many-body statevectors built directly
in the 2^L-dimensional Fock space.

Fock-space conventions (must match MPS.to_statevector):
- basis index b encodes occupations with site 0 as the MOST significant bit:
  b = sum_i n_i * 2^(L-1-i).
- |n> = (c_0^dag)^{n_0} (c_1^dag)^{n_1} ... |0>, so c_i picks up the sign
  (-1)^{sum_{k<i} n_k}.
"""

from __future__ import annotations

import numpy as np


def _site_bit(L: int, i: int) -> int:
    return L - 1 - i


def creation_op(L: int, i: int) -> "np.ndarray":
    """Dense 2^L x 2^L matrix of c_i^dagger."""
    dim = 1 << L
    op = np.zeros((dim, dim))
    bit = 1 << _site_bit(L, i)
    for b in range(dim):
        if b & bit:
            continue
        # sign: number of occupied sites k < i
        nleft = 0
        for k in range(i):
            if b & (1 << _site_bit(L, k)):
                nleft += 1
        op[b | bit, b] = (-1.0) ** nleft
    return op


def annihilation_op(L: int, i: int) -> np.ndarray:
    return creation_op(L, i).T


def apply_creation(L: int, psi: np.ndarray, orbital: np.ndarray) -> np.ndarray:
    """Applies sum_i orbital[i] c_i^dagger to the state vector."""
    out = np.zeros_like(psi, dtype=np.result_type(psi, orbital))
    for i in range(L):
        if orbital[i] != 0:
            out += orbital[i] * (creation_op(L, i) @ psi)
    return out


def slater_statevector(orbitals: np.ndarray) -> np.ndarray:
    """Statevector of prod_a (sum_i orbitals[i, a] c_i^dag) |0> (columns are
    applied left to right, i.e. column 0's operator acts last)."""
    L, N = orbitals.shape
    psi = np.zeros(1 << L, dtype=complex)
    psi[0] = 1.0
    for a in reversed(range(N)):
        psi = apply_creation(L, psi, orbitals[:, a])
    n = np.linalg.norm(psi)
    assert n > 1e-12, "orbitals are linearly dependent"
    return psi / n


def quadratic_hamiltonian(L: int, h: np.ndarray, Delta: np.ndarray | None = None):
    """Dense many-body Hamiltonian  sum h_ij c_i^dag c_j
    + 1/2 sum (Delta_ij c_i^dag c_j^dag + h.c.).  Delta antisymmetric."""
    dim = 1 << L
    H = np.zeros((dim, dim), dtype=complex)
    cd = [creation_op(L, i) for i in range(L)]
    c = [op.T for op in cd]
    for i in range(L):
        for j in range(L):
            if h[i, j] != 0:
                H += h[i, j] * (cd[i] @ c[j])
            if Delta is not None and Delta[i, j] != 0:
                H += 0.5 * Delta[i, j] * (cd[i] @ cd[j])
                H += 0.5 * np.conj(Delta[i, j]) * (c[j] @ c[i])
    return H


def ground_state(H: np.ndarray) -> np.ndarray:
    e, v = np.linalg.eigh(H)
    return v[:, 0]


def correlation_from_statevector(L: int, psi: np.ndarray):
    """(C, F) with C_ij = <c_j^dag c_i>, F_ij = <c_j c_i>."""
    cd = [creation_op(L, i) for i in range(L)]
    c = [op.T for op in cd]
    C = np.zeros((L, L), dtype=complex)
    F = np.zeros((L, L), dtype=complex)
    for i in range(L):
        for j in range(L):
            C[i, j] = psi.conj() @ (cd[j] @ (c[i] @ psi))
            F[i, j] = psi.conj() @ (c[j] @ (c[i] @ psi))
    return C, F


def fidelity(psi1: np.ndarray, psi2: np.ndarray) -> float:
    """|<psi1|psi2>| / (|psi1| |psi2|)."""
    return abs(np.vdot(psi1, psi2)) / (np.linalg.norm(psi1) * np.linalg.norm(psi2))
