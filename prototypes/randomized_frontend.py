"""Prototype: randomized device-resident spectral frontend for the Slater
sweep (round-4 design study).

The round-2/3 conclusion (BASELINE.md) was that neither device QDWH eigh
nor the Fishman-White Givens sweep gives a TPU-native replacement for the
per-cut host LAPACK eigendecompositions: QDWH is slower than host LAPACK at
every feasible size, and the FW sweep's mode vectors are measurably NOT
two-sided localized (prototypes/fishman_white.py --cuts: ~all modes cross),
so its O(w) per-cut promise only holds in a circuit picture that does not
fit the library's frame-based pipeline.

This prototype validates a different, matmul-only frontend that maps
straight onto the MXU (batched over cuts, static shapes):

1. ENTANGLED modes.  For a projector correlation matrix C (C^2 = C), the
   identity C_LL(1 - C_LL) = C_LR C_LR^T means the entangled eigenvectors
   of C_LL (eigenvalue in (delta, 1-delta)) are EXACTLY the left singular
   vectors of the off-diagonal block C_LR with sigma^2 = lambda(1-lambda)
   > delta(1-delta) — a numerically low-rank matrix (area law).  A
   randomized range sketch of C_LR + Rayleigh-Ritz with C_LL recovers
   them with matmuls only.  Two deflated bands (sigma >= 1e-4, then
   1e-8 <= sigma < 1e-4 after projecting the first band out) keep every
   orthonormalization at condition << 1/sqrt(eps_f64), so the tiny
   eigenvalues come out to absolute accuracy ~1e-15 without any
   extended-precision tricks.

2. FILLED modes.  G = P C_LL P with P = I - U_ent U_ent^T is a
   near-projector (eigenvalues ~{1 x n_f, ~0}).  An exact-size random
   sketch Y = G Omega with Omega (x, n_f) is full-rank a.s. with
   condition ~n_f, and CholeskyQR2 orthonormalizes it to machine
   precision — again matmuls + two small Cholesky factorizations.  The
   filled columns are then an orthonormal basis of the filled subspace
   rather than individual eigenvectors; every downstream consumer only
   uses the filled block through determinants of overlap matrices, where
   a basis rotation is a bond-gauge det(Q) = +-1 common to every Schmidt
   vector of the cut (the MPS is invariant).

Run:  python prototypes/randomized_frontend.py
"""

from __future__ import annotations

import numpy as np


def bench_model_C(L, W=8):
    """The bench.py tight-binding cylinder (gapped, chi binding)."""
    Lx = L // W
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                t = -1.0 if x % 2 == 0 else -1.3
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = t
            if W > 1:
                H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    H -= 0.05 * np.eye(L)
    e, v = np.linalg.eigh(H)
    occ = v[:, e < 0]
    return occ @ occ.T


def _orth_gram(Y, rel_drop=1e-13):
    """Orthonormalize columns of Y via Gram eigh, dropping null directions."""
    G = Y.T @ Y
    e, Q = np.linalg.eigh(G)
    keep = e > max(e[-1], 0.0) * rel_drop
    return Y @ (Q[:, keep] / np.sqrt(e[keep]))


def _cholqr2(Y):
    """CholeskyQR2: two Cholesky-QR passes (cond(Y) up to ~1e7)."""
    for _ in range(2):
        G = Y.T @ Y
        R = np.linalg.cholesky(G).T
        Y = np.linalg.solve(R.T, Y.T).T
    return Y


def randomized_cut(C, x, rng, r1=48, r2=48, tau1=1e-4, s_keep=1e-8):
    """Entangled + filled data for the left block of cut x.

    Returns (lam_ent ascending, U_ent (x, k) matching columns,
    U_fill (x, n_f)).
    """
    CLL = C[:x, :x]
    CLR = C[:x, x:]
    # ---- band 1: sigma >= tau1 ----
    G1 = rng.standard_normal((C.shape[0] - x, r1))
    U1 = _orth_gram(CLR @ G1)
    T1 = U1.T @ CLL @ U1
    lam1, W1 = np.linalg.eigh(T1)
    sig2_1 = np.clip(lam1 * (1 - lam1), 0, None)
    keepA = sig2_1 >= tau1**2
    UA = U1 @ W1[:, keepA]
    lamA = lam1[keepA]
    # ---- band 2: s_keep <= sigma < tau1, deflated ----
    G2 = rng.standard_normal((C.shape[0] - x, r2))
    Y2 = CLR @ G2
    Y2 -= UA @ (UA.T @ Y2)
    U2 = _orth_gram(Y2)
    # re-deflate for orthogonality at machine precision
    U2 -= UA @ (UA.T @ U2)
    U2 = _orth_gram(U2)
    T2 = U2.T @ CLL @ U2
    lam2, W2 = np.linalg.eigh(T2)
    sig2_2 = np.clip(lam2 * (1 - lam2), 0, None)
    keepB = (sig2_2 >= s_keep**2) & (sig2_2 < tau1**2)
    UB = U2 @ W2[:, keepB]
    lamB = lam2[keepB]
    lam = np.concatenate([lamA, lamB])
    U = np.concatenate([UA, UB], axis=1)
    order = np.argsort(lam)
    lam, U = lam[order], U[:, order]
    # ---- filled subspace ----
    n_f = int(round(np.trace(CLL) - lam.sum()))
    if n_f:
        Om = rng.standard_normal((x, n_f))
        Y = Om - U @ (U.T @ Om)
        Y = CLL @ Y
        Y -= U @ (U.T @ Y)
        U_fill = _cholqr2(Y)
    else:
        U_fill = np.zeros((x, 0))
    return lam, U, U_fill


def validate(L=256, W=8, cuts=None, seed=0):
    C = bench_model_C(L, W)
    rng = np.random.default_rng(seed)
    cutoff = 1e-12  # svd_min**2 at the default svd_min = 1e-6
    if cuts is None:
        cuts = range(8, L - 7, 7)
    worst_lam = worst_fill = worst_orth = worst_sub = 0.0
    kmax = 0
    for x in cuts:
        lam, U, F = randomized_cut(C, x, rng)
        kmax = max(kmax, lam.size)
        CLL = C[:x, :x]
        e = np.linalg.eigh(CLL)[0]
        ent_exact = e[(e > 1e-16) & (e < 1 - 1e-16)]
        # compare against the exact entangled eigenvalues above s_keep^2
        ent_exact = ent_exact[(ent_exact * (1 - ent_exact)) >= 1e-16]
        if ent_exact.size != lam.size:
            print(f"x={x}: count mismatch exact {ent_exact.size} vs {lam.size}")
            worst_lam = np.inf
            continue
        worst_lam = max(worst_lam, np.abs(np.sort(ent_exact) - lam).max())
        # subspace residual of the entangled Ritz vectors
        R = CLL @ U - U * lam[None, :]
        worst_sub = max(worst_sub, np.abs(R).max())
        # filled basis: orthonormal, inside the lambda~1 eigenspace
        if F.shape[1]:
            worst_orth = max(
                worst_orth, np.abs(F.T @ F - np.eye(F.shape[1])).max()
            )
            worst_fill = max(worst_fill, np.abs(CLL @ F - F).max())
        # counts must match the LAPACK classification at the cutoff
        n_f_exact = int((e > 1 - cutoff).sum())
        n_f_mine = F.shape[1] + int((lam > 1 - cutoff).sum())
        if n_f_exact != n_f_mine:
            print(f"x={x}: filled count mismatch {n_f_exact} vs {n_f_mine}")
            worst_fill = np.inf
    return worst_lam, worst_sub, worst_orth, worst_fill, kmax


def main():
    for L, W in ((64, 8), (256, 8), (128, 4)):
        wl, ws, wo, wf, k = validate(L, W)
        print(
            f"L={L} W={W}: max |dlam|={wl:.2e}  max residual={ws:.2e}  "
            f"max fill-orth={wo:.2e}  max |C F - F|={wf:.2e}  k_max={k}"
        )
    # degenerate / cutoff-straddling stress: exactly degenerate cylinder
    # modes (no dimerization, no diagonal tilt)
    L, W = 128, 8
    Lx = L // W
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = -1.0
            H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    e, v = np.linalg.eigh(H)
    occ = v[:, e < -1e-9]
    C = occ @ occ.T
    rng = np.random.default_rng(7)
    worst = 0.0
    for x in range(8, L - 7, 11):
        lam, U, F = randomized_cut(C, x, rng)
        CLL = C[:x, :x]
        ee = np.linalg.eigh(CLL)[0]
        ent = ee[(ee * (1 - ee)) >= 1e-16]
        if ent.size == lam.size:
            worst = max(worst, np.abs(np.sort(ent) - lam).max())
        else:
            print(f"degenerate x={x}: count {ent.size} vs {lam.size}")
            worst = np.inf
    print(f"degenerate cylinder: max |dlam|={worst:.2e}")


if __name__ == "__main__":
    main()
