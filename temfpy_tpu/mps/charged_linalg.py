"""Charge-resolved matrix factorizations on dense charge-labelled matrices.

A matrix whose rows carry charges ``q_row`` and columns ``q_col`` and which
conserves charge (nonzero entries only where ``q_row == q_col + qtotal``) is
block diagonal after grouping indices by charge.  These helpers run the
factorization sector by sector (each sector a single dense device op) and
reassemble the factors with charge labels on the new internal bond.

This replaces TeNPy's charge-aware ``npc.svd``/``npc.qr`` used throughout the
reference (e.g. iMPS.py:168, canonical forms inside tenpy).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import complex_on_device
from .charges import ChargeInfo
from ..ops.linalg import robust_qr, robust_svd


def _as_backend(M):
    """jnp array, except matrices stay host numpy when the per-sector
    factorizations route to host LAPACK anyway (complex without device
    complex support, or host-eigh mode on accelerator backends): uploading
    them would turn every sector into device gathers + a ~30 ms round trip
    over the TPU tunnel."""
    from ..ops.linalg import _use_host_eigh

    if np.iscomplexobj(M) and not complex_on_device():
        return np.asarray(M)
    if isinstance(M, np.ndarray) and _use_host_eigh():
        return M
    return jnp.asarray(M)


def _common_sectors(chinfo: ChargeInfo, q_row, q_col, qtotal: int):
    """Pairs up row and column sectors connected by the charge rule
    q_row == q_col + qtotal (mod)."""
    q_row = chinfo.make_valid(q_row)
    q_col_eff = chinfo.make_valid(np.asarray(q_col, np.int64) + qtotal)
    sectors = []
    for q in np.unique(np.concatenate([q_row, q_col_eff])):
        rows = np.nonzero(q_row == q)[0]
        cols = np.nonzero(q_col_eff == q)[0]
        if rows.size and cols.size:
            sectors.append((int(q), rows, cols))
    return sectors


def charged_svd(
    M,
    q_row,
    q_col,
    chinfo: ChargeInfo,
    qtotal: int = 0,
    *,
    cutoff: float | None = None,
    chi_max: int | None = None,
    normalize: bool = False,
):
    """Charge-resolved SVD ``M = U diag(S) Vh`` with optional truncation.

    Parameters
    ----------
    M: (m, n) dense device/host matrix, charge conserving.
    q_row, q_col: per-index charge labels.
    qtotal: tensor charge: nonzeros satisfy q_row[i] == q_col[j] + qtotal.
    cutoff: discard singular values below ``cutoff * max(S)``.
    chi_max: keep at most this many singular values (globally, largest first).
    normalize: rescale the kept singular values to unit norm.

    Returns
    -------
    U: (m, k) with column charges ``q_mid + qtotal`` (i.e. U conserves charge
       with qtotal, Vh with 0).
    S: (k,) singular values, **sorted by (charge, descending value)**.
    Vh: (k, n).
    q_mid: (k,) charge labels of the new bond (in column-charge convention:
       ``q_mid[a] == q_col[j]`` for the columns V acts on).
    err: truncated weight, sum of discarded S^2 (unnormalised).
    """
    M = _as_backend(M)
    host = isinstance(M, np.ndarray)
    m, n = M.shape
    sectors = _common_sectors(chinfo, q_row, q_col, qtotal)

    blocks = []  # (q_col_charge, rows, cols, U, S, Vh)
    all_svals = []
    for q, rows, cols in sectors:
        if host:
            blk = M[np.ix_(rows, cols)]
        else:
            blk = M[jnp.asarray(rows)[:, None], jnp.asarray(cols)[None, :]]
        Ub, Sb, Vhb = robust_svd(blk, full_matrices=False)
        Sb_host = np.asarray(Sb)
        q_col_charge = int(chinfo.make_valid(np.asarray(q_col))[cols[0]])
        blocks.append((q_col_charge, rows, cols, Ub, Sb_host, Vhb, Sb, Vhb))
        all_svals.append(Sb_host)

    if not blocks:
        raise ValueError("Matrix has no charge-compatible sectors (all zero?)")

    svals = np.concatenate(all_svals)
    keep_thresh = 0.0
    if cutoff is not None and svals.size:
        keep_thresh = cutoff * svals.max()
    if chi_max is not None and svals.size > chi_max:
        keep_thresh = max(keep_thresh, float(np.sort(svals)[::-1][chi_max - 1]))
        # note: ties at the threshold are all kept (may slightly exceed chi_max)

    # with no truncation requested, keep every singular triplet per sector
    # (including exact zeros) so square inputs yield square factors — e.g.
    # the Procrustes rotation in iMPS.basis_rotation must stay unitary, not
    # become a rank-deficient partial isometry that silently zeroes Schmidt
    # components
    keep_all = cutoff is None and chi_max is None

    U_cols, S_parts, Vh_rows, q_mid = [], [], [], []
    err = 0.0
    for q_col_charge, rows, cols, Ub, Sb_host, Vhb, Sb, _ in blocks:
        if keep_all:
            keep = np.ones(Sb_host.shape, dtype=bool)
        else:
            keep = Sb_host >= max(keep_thresh, 1e-300)
        err += float((Sb_host[~keep] ** 2).sum())
        k = int(keep.sum())
        if k == 0:
            continue
        U_cols.append((rows, Ub[:, :k]))
        S_parts.append(Sb_host[:k])
        Vh_rows.append((cols, Vhb[:k, :]))
        q_mid.append(np.full(k, q_col_charge, dtype=np.int64))

    if not S_parts:
        raise ValueError("All singular values truncated away")

    ks = [len(s) for s in S_parts]
    ktot = sum(ks)
    S = np.concatenate(S_parts)
    q_mid = np.concatenate(q_mid)
    if normalize and S.size:
        S = S / np.linalg.norm(S)

    if host:
        U = np.zeros((m, ktot), dtype=M.dtype)
        Vh = np.zeros((ktot, n), dtype=M.dtype)
        off = 0
        for (rows, Ub), (cols, Vhb), k in zip(U_cols, Vh_rows, ks):
            U[np.ix_(rows, off + np.arange(k))] = np.asarray(Ub)
            Vh[np.ix_(off + np.arange(k), cols)] = np.asarray(Vhb)
            off += k
        return U, S, Vh, q_mid, err
    U = jnp.zeros((m, ktot), dtype=M.dtype)
    Vh = jnp.zeros((ktot, n), dtype=M.dtype)
    off = 0
    for (rows, Ub), (cols, Vhb), k in zip(U_cols, Vh_rows, ks):
        U = U.at[jnp.asarray(rows)[:, None], off + jnp.arange(k)[None, :]].set(Ub)
        Vh = Vh.at[off + jnp.arange(k)[:, None], jnp.asarray(cols)[None, :]].set(Vhb)
        off += k
    return U, S, Vh, q_mid, err


def charged_qr(M, q_row, q_col, chinfo: ChargeInfo, qtotal: int = 0):
    """Charge-resolved thin QR ``M = Q R``.

    Returns (Q, R, q_mid) with the same charge-label conventions as
    :func:`charged_svd`: the internal bond charges ``q_mid`` follow the
    column-charge convention.
    """
    M = _as_backend(M)
    host = isinstance(M, np.ndarray)
    m, n = M.shape
    sectors = _common_sectors(chinfo, q_row, q_col, qtotal)
    if not sectors:
        raise ValueError("Matrix has no charge-compatible sectors (all zero?)")

    parts = []
    ktot = 0
    q_col_valid = chinfo.make_valid(np.asarray(q_col))
    for q, rows, cols in sectors:
        if host:
            blk = M[np.ix_(rows, cols)]
        else:
            blk = M[jnp.asarray(rows)[:, None], jnp.asarray(cols)[None, :]]
        Qb, Rb = robust_qr(blk)
        k = Qb.shape[1]
        parts.append((rows, cols, Qb, Rb, int(q_col_valid[cols[0]]), k))
        ktot += k

    if host:
        Q = np.zeros((m, ktot), dtype=M.dtype)
        R = np.zeros((ktot, n), dtype=M.dtype)
        q_mid = np.empty(ktot, dtype=np.int64)
        off = 0
        for rows, cols, Qb, Rb, qc, k in parts:
            Q[np.ix_(rows, off + np.arange(k))] = np.asarray(Qb)
            R[np.ix_(off + np.arange(k), cols)] = np.asarray(Rb)
            q_mid[off : off + k] = qc
            off += k
        return Q, R, q_mid
    Q = jnp.zeros((m, ktot), dtype=M.dtype)
    R = jnp.zeros((ktot, n), dtype=M.dtype)
    q_mid = np.empty(ktot, dtype=np.int64)
    off = 0
    for rows, cols, Qb, Rb, qc, k in parts:
        Q = Q.at[jnp.asarray(rows)[:, None], off + jnp.arange(k)[None, :]].set(Qb)
        R = R.at[off + jnp.arange(k)[:, None], jnp.asarray(cols)[None, :]].set(Rb)
        q_mid[off : off + k] = qc
        off += k
    return Q, R, q_mid


def charged_eigh(rho, q, chinfo: ChargeInfo):
    """Hermitian eigendecomposition of a charge-block-diagonal matrix,
    sector by sector (host LAPACK: these are the small, accuracy-critical
    gauge factorizations).

    Returns (e, U, q_cols): eigenvalues ascending *within* each sector,
    sectors concatenated in ascending charge order; U columns carry the
    sector labels ``q_cols``.
    """
    rho_h = np.asarray(rho)
    q = chinfo.make_valid(q)
    n = rho_h.shape[0]
    e = np.empty(n, dtype=float)
    U = np.zeros_like(rho_h)
    q_cols = np.empty(n, dtype=np.int64)
    off = 0
    for qv in np.unique(q):
        idx = np.nonzero(q == qv)[0]
        eb, ub = np.linalg.eigh(rho_h[np.ix_(idx, idx)])
        k = len(idx)
        e[off : off + k] = eb
        U[idx, off : off + k] = ub
        q_cols[off : off + k] = qv
        off += k
    return e, U, q_cols
