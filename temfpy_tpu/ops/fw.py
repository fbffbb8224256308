"""Fishman-White mode-disentangling spectral frontend (arXiv:1504.07701).

Replaces the per-cut O(x^3) block eigendecompositions of the Slater
spectral frontend — the reference's hot loop (reference slater.py:347,
sweep loop slater.py:1301-1346), O(L^4) over a conversion — with ONE
O(L^2 w) disentangling sweep plus O(w^3) work per cut:

1. ``fw_disentangle``: slide a window of width ``w`` along the chain;
   inside the window, find the eigenvector of the local correlation block
   whose eigenvalue is closest to 0 or 1, reflect it onto the window's
   first site with a Householder reflector, and freeze that site at the
   rounded occupation.  The accumulated reflectors form an orthogonal mode
   basis ``V`` with ``C ~ V diag(n) V^T`` and per-site truncation error
   ``|eigenvalue - rounded|`` (decays exponentially with ``w`` for gapped
   states).  Because window ``i`` only ever mixes rows ``[i, i+w)`` and a
   row is pristine until the first window reaches it, every mode's support
   is confined to O(w) sites around its home site — the basis is banded.

2. ``fw_frames``: per entanglement cut, the block eigenbasis follows from
   the O(w) FILLED modes crossing the cut: the block is (up to the frozen
   error) ``W_F W_F^T`` plus exact rank-one projectors of the one-sided
   filled modes, so its entangled eigenpairs are the eigenpairs of the
   small Gram ``G = W_F^T W_F``.  The eigenvector FRAMES are materialised
   on the DEVICE from the once-uploaded mode matrix: gather the one-sided
   filled columns, combine the crossing columns with the (w x w) Gram
   coefficients, and mask rows to the block — so the per-cut upload is a
   few KB of indices/coefficients instead of the dense (L, W) slab.

TPU-first data motion: the compact host frontend uploads O(L^2) of frame
slab per cut block (13 s of the L=1024 conversion at the measured
204 MB/s tunnel rate, BASELINE.md round 4) and spends O(L^4) in host
LAPACK (8.7 s).  This frontend uploads the (L, L) mode matrix once and
runs one small batched einsum per cut block.

Numerical contract: identical to the exact per-cut eigh up to the frozen
error (gated at ``fw_tol`` per site, adaptively widening the window) and
the support tail ``fw_support_tol``.  Near-cutoff eigenvector columns are
normalised by 1/sqrt(lambda), amplifying tail noise by up to
1/sqrt(cutoff) — but any Schmidt vector occupying such an orbital carries
weight sqrt(lambda), so the amplification cancels at the state level.
Gapless / critical correlation matrices where no window reaches ``fw_tol``
make ``fw_disentangle`` return None and the caller falls back to the
compact host frontend (failure detection, not silent degradation).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import profiling

logger = logging.getLogger(__name__)


def _env_int(name, default):
    return int(os.environ.get(name, str(default)))


def _env_float(name, default):
    return float(os.environ.get(name, str(default)))


def fw_mode() -> str:
    """"auto" (default: on for real C on accelerator backends at
    L >= TEMFPY_TPU_FW_MIN_L), "0" (off), "1" (force, incl. CPU layouts —
    tests and A/B runs)."""
    return os.environ.get("TEMFPY_TPU_FW", "auto")


def fw_min_L() -> int:
    return _env_int("TEMFPY_TPU_FW_MIN_L", 256)


def fw_w0() -> int:
    """Initial window width (doubles adaptively up to fw_w_max)."""
    return _env_int("TEMFPY_TPU_FW_W0", 32)


def fw_w_max() -> int:
    return _env_int("TEMFPY_TPU_FW_WMAX", 256)


def fw_tol() -> float:
    """Per-site frozen-mode error targeted by the window widening."""
    return _env_float("TEMFPY_TPU_FW_TOL", 1e-11)


def fw_accept_tol() -> float:
    """Per-site error accepted once widening is exhausted (chain tails pin
    the window at L - i, where errors accumulated from earlier freezes land
    slightly above fw_tol; the state-level effect is the SUM of the frozen
    errors, gated separately by fw_total_tol)."""
    return _env_float("TEMFPY_TPU_FW_ATOL", 1e-9)


def fw_total_tol() -> float:
    """Budget on the summed frozen-mode error of the whole sweep; well below
    the 1e-8 diagonalization contract and the 1e-6 Schmidt floor."""
    return _env_float("TEMFPY_TPU_FW_TTOL", 1e-8)


def fw_support_tol() -> float:
    """Squared-weight threshold below which a mode counts as one-sided."""
    return _env_float("TEMFPY_TPU_FW_STOL", 1e-26)


def fw_slab() -> int:
    """Cuts per device frame slab (memory/compile granularity)."""
    return _env_int("TEMFPY_TPU_FW_SLAB", 16)


def use_fw(C, L: int) -> bool:
    from .linalg import _cpu_layout

    mode = fw_mode()
    if mode == "0":
        return False
    if np.iscomplexobj(C):
        return False
    if mode == "1":
        return True
    return (not _cpu_layout()) and L >= fw_min_L()


# --------------------------------------------------------------------------
# the disentangling sweep
# --------------------------------------------------------------------------


@dataclass
class FWModes:
    """Result of one disentangling sweep over a correlation matrix."""

    V: np.ndarray  # (L, L) orthogonal, columns = modes, C ~ V diag(n) V^T
    n: np.ndarray  # (L,) frozen occupations in {0, 1}
    P: np.ndarray  # (L+1, L) prefix weights: P[x, j] = sum(V[:x, j]**2)
    max_err: float
    total_err: float = 0.0
    _dev: object = field(default=None, repr=False)

    def device_V(self):
        if self._dev is None:
            with profiling.stage("fw/upload"):
                self._dev = jnp.asarray(self.V)
        return self._dev


def fw_disentangle(C, w0=None, w_max=None, err_tol=None):
    """One left-to-right sweep; returns FWModes or None (no window within
    ``w_max`` isolates a mode to the acceptance gate, or the summed frozen
    error exceeds its budget — gapless/critical input)."""
    w0 = w0 or fw_w0()
    w_max = w_max or fw_w_max()
    err_tol = err_tol if err_tol is not None else fw_tol()
    accept_tol = max(fw_accept_tol(), err_tol)
    total_tol = fw_total_tol()
    C = np.array(C, dtype=np.float64, order="C")
    L = C.shape[0]
    n_fermion = int(np.round(np.trace(C)))
    U = np.eye(L)  # accumulated reflectors: U C0 U^T ~ diag(n)
    n = np.zeros(L)
    max_err = 0.0
    total_err = 0.0
    for i in range(L):
        wl = min(w0, L - i)
        while True:
            blk = C[i : i + wl, i : i + wl]
            e, v = np.linalg.eigh(blk)
            dist = np.minimum(np.abs(e), np.abs(1.0 - e))
            k = int(np.argmin(dist))
            if dist[k] <= err_tol or wl >= min(w_max, L - i):
                break
            wl = min(2 * wl, w_max, L - i)
        total_err += float(dist[k])
        if dist[k] > accept_tol or total_err > total_tol:
            logger.info(
                "FW sweep: site %d frozen error %.3e (sum %.3e) over the "
                "%.1e/%.1e gates at w=%d; falling back to the exact frontend",
                i, dist[k], total_err, accept_tol, total_tol, wl,
            )
            return None
        max_err = max(max_err, float(dist[k]))
        n[i] = np.round(e[k])
        vec = v[:, k]
        if wl > 1:
            # Householder u: (I - 2 u u^T) vec = -sign(vec[0]) e0
            sign = 1.0 if vec[0] >= 0 else -1.0
            u = vec.copy()
            u[0] += sign
            nu = np.linalg.norm(u)
            if nu > 1e-14:
                u /= nu
                rows = slice(i, i + wl)
                C[rows, :] -= 2.0 * np.outer(u, u @ C[rows, :])
                C[:, rows] -= 2.0 * np.outer(C[:, rows] @ u, u)
                U[rows, :] -= 2.0 * np.outer(u, u @ U[rows, :])
        # freeze site i at the rounded occupation (the method's truncation)
        C[i, i + 1 :] = 0.0
        C[i + 1 :, i] = 0.0
        C[i, i] = n[i]
    if int(n.sum()) != n_fermion:
        logger.warning(
            "FW sweep: frozen filling %d != trace %d; falling back",
            int(n.sum()), n_fermion,
        )
        return None
    V = np.ascontiguousarray(U.T)
    P = np.zeros((L + 1, L))
    np.cumsum(V * V, axis=0, out=P[1:])
    return FWModes(V=V, n=n, P=P, max_err=max_err, total_err=total_err)


# --------------------------------------------------------------------------
# per-conversion cache (the sweep runs once; cut blocks stream afterwards)
# --------------------------------------------------------------------------

_CACHE: list = []  # [(C_host, FWModes | None)], newest last, capacity 2


def _cached_sweep(C_host):
    for C_ref, modes in _CACHE:
        if C_ref is C_host:
            return modes
    with profiling.stage("fw/sweep"):
        modes = fw_disentangle(C_host)
    _CACHE.append((C_host, modes))
    del _CACHE[:-2]
    return modes


def fw_clear_cache():
    _CACHE.clear()


# --------------------------------------------------------------------------
# per-cut frames
# --------------------------------------------------------------------------


def _pow2(n, lo):
    b = lo
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("side", "L"))
def _fw_frame_slab(Vd, Xidx, Cmat, Fidx, colmap, xs, *, side, L):
    """Materialise a slab of per-cut eigenvector frames from the resident
    mode matrix.

    Vd (L, L): columns = modes.  Per cut b: Xidx (kb,) crossing-filled
    column indices (pad 0 — the matching Cmat rows are zero); Cmat
    (kb, keb) Gram eigenvector coefficients (columns = entangled frame
    columns, ascending eigenvalue); Fidx (fb,) one-sided filled column
    indices (pad -1 -> zero column); colmap (Wb,) final column order
    (ascending block eigenvalue: Gram columns then filled; pad keb+fb ->
    zero column); xs block size (rows outside the block are masked)."""
    rows = jnp.arange(L)
    if side == "L":
        mask = rows[None, :] < xs[:, None]  # (B, L)
    else:
        mask = rows[None, :] >= (L - xs)[:, None]
    VX = Vd.T[Xidx] * mask[:, None, :].astype(Vd.dtype)  # (B, kb, L)
    ent = jnp.einsum("bkl,bke->ble", VX, Cmat)  # (B, L, keb)
    VF = jnp.swapaxes(Vd.T[jnp.maximum(Fidx, 0)], 1, 2)  # (B, L, fb)
    VF = VF * (Fidx >= 0)[:, None, :] * mask[:, :, None].astype(Vd.dtype)
    pad = jnp.zeros_like(ent[:, :, :1])
    mid = jnp.concatenate([ent, VF, pad], axis=2)  # (B, L, keb + fb + 1)
    return jnp.take_along_axis(mid, colmap[:, None, :], axis=2)


def _cut_data(modes: FWModes, size: int, side: str, cutoff: float):
    """Host classification + Gram eigh of one cut.

    Returns (e_full, col0, Xidx, coef, Fidx) — coef columns ascending by
    Gram eigenvalue; frame columns = [Gram combos asc | one-sided filled]."""
    L = modes.V.shape[0]
    s = fw_support_tol()
    if side == "L":
        wB = modes.P[size]  # block-side weight per mode
    else:
        wB = modes.P[L] - modes.P[L - size]
    wO = modes.P[L] - wB  # other-side weight
    filled = modes.n > 0.5
    cross = (wB > s) & (wO > s)
    F = np.nonzero(cross & filled)[0]
    one_sided = np.nonzero(filled & (wO <= s) & (wB > s))[0]
    rows = slice(None, size) if side == "L" else slice(L - size, None)
    if F.size:
        WF = modes.V[rows, F]  # (size, kf)
        G = WF.T @ WF
        lam, Ug = np.linalg.eigh(G)
        lam = np.clip(lam, 0.0, 1.0)
        keep = lam > cutoff
        lam_keep = lam[keep]
        coef = Ug[:, keep] / np.sqrt(np.maximum(lam[keep], cutoff))
    else:
        lam_keep = np.zeros(0)
        coef = np.zeros((0, 0))
    e_occ = np.concatenate([lam_keep, np.ones(one_sided.size)])
    col0 = size - e_occ.size
    assert col0 >= 0, (
        f"FW cut bookkeeping: {e_occ.size} occupied columns in a "
        f"{size}-dim block"
    )
    e_full = np.zeros(size)
    e_full[col0:] = e_occ
    return e_full, col0, F, coef, one_sided


def fw_frames(C_host, sizes, side, cutoff, chunk=None):
    """Drop-in for the compact host frontend's contract: eigendecompose all
    sweep blocks, returning (e_list, col0_list, frame_list) per cut with
    device frame handles.  Returns None if the disentangling sweep fails
    (caller falls back to exact host LAPACK)."""
    modes = _cached_sweep(C_host)
    if modes is None:
        return None
    L = C_host.shape[0]
    n = len(sizes)
    B = fw_slab()
    Vd = modes.device_V()

    es, col0s, frames = [], [], []
    for j0 in range(0, n, B):
        sl = [int(x) for x in sizes[j0 : j0 + B]]
        with profiling.stage("fw/cuts"):
            cuts = [_cut_data(modes, x, side, cutoff) for x in sl]
        with profiling.stage("fw/pack"):
            kb = _pow2(max((c[2].size for c in cuts), default=1), 8)
            keb = _pow2(max((c[3].shape[1] for c in cuts), default=1), 8)
            fb = _pow2(max((c[4].size for c in cuts), default=1), 8)
            Wb = _pow2(
                max((c[3].shape[1] + c[4].size for c in cuts), default=1), 8
            )
            # slab count padded to B: one executable per shape family
            Xidx = np.zeros((B, kb), np.int32)
            Cmat = np.zeros((B, kb, keb), modes.V.dtype)
            Fidx = np.full((B, fb), -1, np.int32)
            colmap = np.full((B, Wb), keb + fb, np.int32)
            xs = np.zeros(B, np.int32)
            for t, (e_full, col0, F, coef, one_sided) in enumerate(cuts):
                m = coef.shape[1]
                f = one_sided.size
                Xidx[t, : F.size] = F
                Cmat[t, : F.size, :m] = coef
                Fidx[t, :f] = one_sided
                colmap[t, :m] = np.arange(m)
                colmap[t, m : m + f] = keb + np.arange(f)
                xs[t] = sl[t]
        with profiling.stage("fw/kernel"):
            slab = _fw_frame_slab(
                Vd,
                jnp.asarray(Xidx),
                jnp.asarray(Cmat),
                jnp.asarray(Fidx),
                jnp.asarray(colmap),
                jnp.asarray(xs),
                side=side,
                L=L,
            )
        from ..slater import _take_frame

        for t, (e_full, col0, *_rest) in enumerate(cuts):
            es.append(e_full)
            col0s.append(col0)
            frames.append(_take_frame(slab, jnp.asarray(t, jnp.int32)))
    return es, col0s, frames
