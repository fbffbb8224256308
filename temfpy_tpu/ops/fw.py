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
error.  The window widens adaptively until the per-site error reaches
``fw_tol``; once widening is exhausted (chain tails pin the window at
L - i), per-site errors up to ``fw_accept_tol`` are ACCEPTED as long as
the running SUM of all frozen errors stays within the ``fw_total_tol``
budget (which scales with L, see :func:`fw_total_tol`) — the state-level
effect of the truncations is bounded by that sum.  The support tail is
gated by ``fw_support_tol``.  Near-cutoff eigenvector columns are
normalised by 1/sqrt(lambda), amplifying tail noise by up to
1/sqrt(cutoff) — but any Schmidt vector occupying such an orbital carries
weight sqrt(lambda), so the amplification cancels at the state level.
Gapless / critical correlation matrices where a site's error exceeds
``fw_accept_tol`` or the summed budget make ``fw_disentangle`` return
None and the caller falls back to the compact host frontend (failure
detection, not silent degradation).

BdG / Pfaffian frontend: deliberately NOT wired (round 5).  The sweep
extends in principle to Nambu correlation matrices — freeze Bogoliubov
modes in particle-hole-conjugate PAIRS with symplectic (PH-commuting)
reflectors so the frozen basis stays a valid Bogoliubov transformation —
but three measured facts argue against building it now: (a) the
Pfaffian path's frontend cost is dominated by the Nambu FRAME UPLOAD,
already halved by shipping half-frames (BASELINE.md round 4), not by the
host eigh the sweep would replace; (b) the BdG stress model (chiral
p+ip cylinder) is quasi-gapless exactly like the Slater bench cylinder,
where this sweep measures O(sum k_f^3) rather than the gapped-case
O(L^2 w) — the regime where FW wins is the regime the Pfaffian bench
never enters; (c) PH-paired freezing halves the available window
directions, so the frozen-error floor for a given width w is strictly
worse than the Slater case.  Revisit if a gapped large-L BdG workload
appears; the fallback contract (return None -> exact frontend) is the
designed extension seam.
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
    """Auto-on threshold.  Measured crossover on the TPU tunnel
    (BASELINE.md round 4): the exact compact frontend wins at L=256
    (19.5 s vs 28.3 s) and ties at L=512 (47.4 vs 48.1); FW wins at
    L=1024 (100.6 vs 119.1) where the frame-slab upload and the O(L^4)
    host LAPACK total dominate the exact path."""
    return _env_int("TEMFPY_TPU_FW_MIN_L", 768)


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


def fw_total_tol(L: int | None = None) -> float:
    """Budget on the summed frozen-mode error of the whole sweep; at the
    1e-8 diagonalization contract for L <= 1024 and scaling linearly above
    (the summed error grows roughly linearly with L at fixed per-site
    quality, so a fixed budget would spuriously fail legitimately gapped
    long chains), still well below the 1e-6 Schmidt floor.  An explicitly
    set TEMFPY_TPU_FW_TTOL is taken verbatim (no L floor) — the knob is
    the operator override."""
    if "TEMFPY_TPU_FW_TTOL" in os.environ:
        return _env_float("TEMFPY_TPU_FW_TTOL", 1e-8)
    if L is None:
        return 1e-8
    return max(1e-8, L * 1e-11)


def fw_support_tol() -> float:
    """Squared-weight threshold below which a mode counts as one-sided."""
    return _env_float("TEMFPY_TPU_FW_STOL", 1e-26)


def fw_slab() -> int:
    """Cuts per device frame slab (memory/compile granularity).  The
    default matches the stream's eigh_chunk block, so a block is one
    kernel dispatch + two uploads."""
    return _env_int("TEMFPY_TPU_FW_SLAB", 64)


def fw_sync() -> bool:
    """Block on the frame chain before returning from the frontend (see
    fw_frames).  Default ON: leaving the chain queued lets the in-process
    tunnel client stream it DURING the fill's host planning, inflating
    every host stage on a single-core host (measured +9 s at L=256,
    BASELINE.md round 4); =0 restores the overlapped dispatch for
    multi-core hosts."""
    return _env_int("TEMFPY_TPU_FW_SYNC", 1) == 1


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
    C = np.array(C, dtype=np.float64, order="C")
    L = C.shape[0]
    total_tol = fw_total_tol(L)
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
            # the summed-budget trip (per-site error fine, budget not) is
            # the surprising one — surface it at WARNING, not INFO
            log = logger.warning if dist[k] <= accept_tol else logger.info
            log(
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
    # NOTE a Wannier re-localization of the filled modes (diagonalizing the
    # filled-subspace position operator, which leaves C ~ V_f V_f^T
    # invariant) was tried here and REVERTED: on the bench cylinder several
    # transverse channels are partially filled (quasi-gapless), the Wannier
    # tails stay power-law (min-side weight 4e-4 at rank 200 of 262), the
    # crossing sets do not shrink, and the extra (nf, nf) eigh plus a
    # denser V slowed the frontend 2x (BASELINE.md round 4).
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


@partial(jax.jit, static_argnames=("side", "L", "B", "kb", "fb", "Wb"))
def _fw_frame_slab(Vd, flat, Cmat, *, side, L, B, kb, fb, Wb):
    """Materialise a slab of per-cut eigenvector frames from the resident
    mode matrix.

    Vd (L, L): columns = modes.  ``flat`` is ONE fused int32 upload
    (uploads over the TPU tunnel pay a ~ms round trip EACH; five small
    transfers per slab dominated the fw/kernel stage) holding, per cut b:
    Xidx (kb,) crossing-filled column indices (pad 0 — the matching Cmat
    rows are zero); Fidx (fb,) one-sided filled column indices (pad -1 ->
    zero column); colmap (Wb,) final column order (ascending block
    eigenvalue: Gram columns then filled; pad keb+fb -> zero column);
    xs (1,) block size (rows outside the block are masked).  Cmat
    (B, kb, keb): Gram eigenvector coefficients (columns = entangled
    frame columns, ascending eigenvalue)."""
    off = 0
    Xidx = flat[:, off : off + kb]
    off += kb
    Fidx = flat[:, off : off + fb]
    off += fb
    colmap = flat[:, off : off + Wb]
    off += Wb
    xs = flat[:, off]
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


def _cut_data_batch(modes: FWModes, sizes, side: str, cutoff: float):
    """Host classification + Gram eigh of a block of cuts, batched.

    Returns a list of (e_full, col0, Xidx, coef, Fidx) per cut — coef
    columns ascending by Gram eigenvalue; frame columns =
    [Gram combos asc | one-sided filled].

    The per-cut Gram ``W_F(x)^T W_F(x)`` is NOT formed from per-cut column
    gathers + GEMMs (O(L^2 w) host copies per block — 12 s of the L=1024
    run): the cuts of a block are nested, so one incremental prefix Gram
    over the block's UNION crossing set serves every cut (each row of V
    enters the accumulation once), and the per-cut small eighs run as ONE
    identity-padded batched ``np.linalg.eigh`` call."""
    L = modes.V.shape[0]
    s = fw_support_tol()
    sizes = np.asarray(sizes, dtype=np.int64)
    n = len(sizes)
    with profiling.stage("fw/cuts_classify"):
        # classification, all cuts at once: per-mode block-side weight
        if side == "L":
            wB = modes.P[sizes]  # (n, L)
        else:
            wB = modes.P[L][None] - modes.P[L - sizes]
        wO = modes.P[L][None] - wB
        filled = modes.n > 0.5
        cross_m = (wB > s) & (wO > s) & filled[None]  # (n, L)
        ones_m = filled[None] & (wO <= s) & (wB > s)

    # union crossing set of the block + incremental prefix Gram at each
    # distinct block size (rows enter ascending for "L", descending-from-
    # the-end for "R")
    with profiling.stage("fw/cuts_prefix"):
        (Fu,) = np.nonzero(cross_m.any(axis=0))
        cumG = {}
        if Fu.size:
            order = np.argsort(sizes, kind="stable")
            G = np.zeros((Fu.size, Fu.size))
            prev = 0
            for t in order:
                x = int(sizes[t])
                if x > prev:
                    rows = (
                        modes.V[prev:x, Fu]
                        if side == "L"
                        else modes.V[L - x : L - prev, Fu]
                    )
                    G += rows.T @ rows
                    prev = x
                if x not in cumG:
                    cumG[x] = G.copy()
        pos_in_Fu = np.full(L, -1, np.int64)
        pos_in_Fu[Fu] = np.arange(Fu.size)

    # identity-padded batched eighs, one per pow2(kf) bucket (a single
    # block-wide pad would cost the edge blocks ~the union size cubed).
    # Padding eigenvalues sit at 2 > 1 >= every true Gram eigenvalue, so
    # the true pairs are the FIRST kf of the ascending output and their
    # vectors have no support on the padding rows.
    Fs = [np.nonzero(cross_m[t])[0] for t in range(n)]
    lam_of = [None] * n
    coef_of = [None] * n
    buckets: dict[int, list[int]] = {}
    for t, F in enumerate(Fs):
        if F.size:
            # ceil-to-64 grid: pow2 pads a kf=520 Gram to 1024 (8x flops)
            buckets.setdefault(-(-F.size // 64) * 64, []).append(t)
    with profiling.stage("fw/cuts_eigh"):
        for kfb, ts in buckets.items():
            Gb = np.tile(2.0 * np.eye(kfb), (len(ts), 1, 1))
            for j, t in enumerate(ts):
                F = Fs[t]
                sel = pos_in_Fu[F]
                Gb[j, : F.size, : F.size] = cumG[int(sizes[t])][
                    np.ix_(sel, sel)
                ]
            lam_b, Ug_b = np.linalg.eigh(Gb)
            lam_b = np.clip(lam_b, 0.0, 1.0)
            for j, t in enumerate(ts):
                lam_of[t] = lam_b[j]
                coef_of[t] = Ug_b[j]

    out = []
    for t in range(n):
        size = int(sizes[t])
        F = Fs[t]
        one_sided = np.nonzero(ones_m[t])[0]
        if F.size:
            lam = lam_of[t][: F.size]
            keep = lam > cutoff
            lam_keep = lam[keep]
            coef = coef_of[t][: F.size, : F.size][:, keep] / np.sqrt(
                np.maximum(lam_keep, cutoff)
            )
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
        out.append((e_full, col0, F, coef, one_sided))
    return out


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
    with profiling.stage("fw/cuts"):
        all_cuts = _cut_data_batch(modes, sizes, side, cutoff)
    # ONE frame-width family (Wb) per fw_frames call (the stream's
    # eigh_chunk block): per-slab Wb buckets fragment the downstream overlap
    # groups, whose key includes the frame SHAPES — a 16-cut slab
    # granularity cost the L=512 fill ~2x in det_stack (per-site operand
    # stacks instead of one gather per group, BASELINE.md round 4).  The
    # INTERNAL widths kb/keb/fb do NOT feed that key (the slab output is
    # (B, L, Wb) regardless), so they are sized per slab: a call-wide pow2
    # of the block maximum made every tail slab carry the mid-chain Gram
    # width — at L >= 1024 (kf ~ 529 -> kb = keb = 1024) that is ~512 MB of
    # Cmat uploaded per slab even for slabs whose crossing sets are tiny.
    Wb = _pow2(
        max((c[3].shape[1] + c[4].size for c in all_cuts), default=1), 8
    )
    from ..slater import _take_frame

    for j0 in range(0, n, B):
        cuts = all_cuts[j0 : j0 + B]
        kb = _pow2(max((c[2].size for c in cuts), default=1), 8)
        keb = _pow2(max((c[3].shape[1] for c in cuts), default=1), 8)
        fb = _pow2(max((c[4].size for c in cuts), default=1), 8)
        with profiling.stage("fw/pack"):
            # slab count padded to B: one executable per shape family;
            # all int32 fields fused into ONE upload buffer per slab
            flat = np.zeros((B, kb + fb + Wb + 1), np.int32)
            Cmat = np.zeros((B, kb, keb), modes.V.dtype)
            flat[:, kb : kb + fb] = -1
            flat[:, kb + fb : kb + fb + Wb] = keb + fb
            for t, (e_full, col0, F, coef, one_sided) in enumerate(cuts):
                m = coef.shape[1]
                f = one_sided.size
                flat[t, : F.size] = F
                Cmat[t, : F.size, :m] = coef
                flat[t, kb : kb + f] = one_sided
                flat[t, kb + fb : kb + fb + m] = np.arange(m)
                flat[t, kb + fb + m : kb + fb + m + f] = keb + np.arange(f)
                flat[t, kb + fb + Wb] = len(e_full)
        with profiling.stage("fw/kernel"):
            slab = _fw_frame_slab(
                Vd,
                jnp.asarray(flat),
                jnp.asarray(Cmat),
                side=side,
                L=L,
                B=B,
                kb=kb,
                fb=fb,
                Wb=Wb,
            )
        for t, (e_full, col0, *_rest) in enumerate(cuts):
            es.append(e_full)
            col0s.append(col0)
            frames.append(_take_frame(slab, jnp.asarray(t, jnp.int32)))
    if fw_sync() and frames:
        # drain the frame-materialisation chain before the fill's host
        # planning starts: on a single-core host the in-process tunnel
        # client streaming the queued slab kernels/gathers competes with
        # planning for the one core (same mechanism as the stream-lookahead
        # negative result, BASELINE.md round 4).  ONE sync on the last
        # dispatched gather suffices (single-stream in-order execution);
        # per-frame blocking costs a tunnel round trip EACH (measured
        # 18.7 s for 512 frames at L=512).
        with profiling.stage("fw/drain"):
            frames[-1].block_until_ready()
    return es, col0s, frames
