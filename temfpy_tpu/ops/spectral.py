"""Randomized device-resident spectral frontend for the Slater sweep.

Replaces the per-cut host LAPACK eigendecompositions of the conversion
sweep (reference slater.py:347 inside the loop slater.py:1301-1346) with a
matmul-only algorithm that runs batched on the MXU:

- **Entangled modes.**  For a projector correlation matrix C (C^2 = C) the
  identity ``C_LL (1 - C_LL) = C_LR C_LR^T`` makes the entangled
  eigenvectors of the cut block C_LL exactly the left singular vectors of
  the off-diagonal block C_LR, with sigma^2 = lambda (1 - lambda) — a
  numerically low-rank matrix (area law).  They are recovered by a
  *banded, deflated* randomized subspace iteration: four sigma-bands
  ([1e-2, inf), [1e-4, 1e-2), [1e-6, 1e-4), [3e-8, 1e-6)), each band
  sketched, power-iterated against the deflation of all previous bands,
  and resolved by Rayleigh-Ritz with C_LL.  Banding keeps every Gram
  orthonormalization at condition << 1/eps_f64; deflation makes the
  subspace iteration converge fast (the effective spectral tail of each
  band is the next band down).  A residual filter rejects unresolved
  mixture directions (sigma is blind to the lambda vs 1-lambda side, so a
  marginal direction can mix a near-0 and a near-1 mode into a
  mid-spectrum impostor), and rejected modes are re-found by the next
  band through an extended keep-window.
- **Filled modes.**  G = P C_LL P with P = 1 - U_ent U_ent^T is a
  near-projector onto the filled subspace; an exact-size random sketch
  Y = G Omega (n_f columns, n_f from the block trace minus the entangled
  weight) is full rank a.s., and CholeskyQR2 orthonormalizes it with two
  small Cholesky factorizations.  The filled columns span the lambda~1
  eigenspace but are not individual eigenvectors; downstream consumers
  only touch the filled block through determinants of overlap matrices,
  where an orthogonal basis change is a bond-gauge factor det(Q) = +-1
  common to every Schmidt vector of the cut (the MPS is invariant).
- **Self-verification.**  Per cut, the residual trace
  tr(C_LL) - sum(lambda) must be integer (the filled count) to
  ``trace_tol``; cuts that fail (lost mid-spectrum weight, ~2% worst
  case in validation) fall back to the host LAPACK frontend.  Modes lost
  *below* the sigma floor are absorbed into the filled/empty counts with
  error <= floor^2 ~ 1e-15 — numerically inert.

Design study and accuracy measurements: prototypes/randomized_frontend.py
(the Fishman-White Givens sweep was evaluated first — prototype
measurement: its mode vectors are not two-sided localized, so its O(w)
per-cut promise holds only in a circuit picture that does not fit the
frame-based pipeline; this frontend is the MXU-idiomatic alternative).

Cost: O(L^2 r) per cut for the entangled bands plus O(L^2 n_f) for the
filled sketch — O(L^3 (r + N)) per sweep, the same flop order as the
LAPACK loop's O(L^4), but batched dense matmuls on the MXU instead of a
serial host loop, and with eigenvalues leaving the device as one packed
f32 buffer per chunk (the tunnel downloads at ~1 MB/s; BASELINE.md).
"""

from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

# sigma-band edges (descending), sigma floor, and iteration counts
BAND_EDGES = (1e-2, 1e-4, 1e-6)
SIGMA_FLOOR = 3e-8
N_BANDS = len(BAND_EDGES) + 1
POWER_STEPS = 2
RES_TOL = 1e-6
TRACE_TOL = 1e-10
LAM_SENTINEL = 3.0  # > any eigenvalue; marks invalid lanes in outputs
_BIG = 1e6  # Ritz sentinel pushing dropped dims out of every keep window


def _env_int(name, default):
    return int(os.environ.get(name, str(default)))


def rsf_rank() -> int:
    """Per-band sketch rank (must exceed the largest per-band mode count;
    ~W log(1/sigma_floor) per band for a width-W cylinder)."""
    return _env_int("TEMFPY_TPU_RSF_RANK", 64)


def rsf_kb() -> int:
    """Entangled-column bucket of the assembled frames (max modes/cut)."""
    return _env_int("TEMFPY_TPU_RSF_KB", 96)


def rsf_chunk() -> int:
    """Cuts per chunk executable (larger chunks amortize the batched
    small-eigh cost; slab memory is m * L * (kb + rf) * 8 bytes)."""
    return _env_int("TEMFPY_TPU_RSF_CHUNK", 32)


def rsf_mode() -> str:
    """"0" (off, the default), "1" (on), "auto" (on for real C on
    accelerator backends above the L threshold).

    Off by default after the round-4 A/B: at L=512/chi=512 the warm
    conversion measured 120.7 s with the randomized frontend vs 56.7 s
    with the compact host-LAPACK frontend (the banded subspace iteration
    plus batched small eighs cost ~54 s of device time where host LAPACK
    plus the occupied-column upload costs ~10 s; BASELINE.md round 4).
    The frontend remains available for A/B and for scales where the host
    eigh's O(L^4) eventually binds."""
    return os.environ.get("TEMFPY_TPU_RSF", "0")


def rsf_min_L() -> int:
    return _env_int("TEMFPY_TPU_RSF_MIN_L", 512)


def use_rsf(C, L: int) -> bool:
    from .linalg import _cpu_layout

    mode = rsf_mode()
    if mode == "0":
        return False
    if np.iscomplexobj(C):
        return False
    if mode == "1":
        return True
    return (not _cpu_layout()) and L >= rsf_min_L()


# --------------------------------------------------------------------------
# chunk kernel
# --------------------------------------------------------------------------


def _corth(Y, floor):
    """Gram-eigh orthonormalization of (m, L, r) column blocks, dropping
    directions with Gram eigenvalue <= floor^2 (dropped lanes — and zero
    input columns — come out as exact zero columns, no-ops downstream)."""
    G = jnp.einsum("ilr,ils->irs", Y, Y)
    e, Q = jnp.linalg.eigh(G)
    keep = e > floor * floor
    inv = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, e, 1.0)), 0.0)
    return jnp.einsum("ilr,irs->ils", Y, Q * inv[:, None, :])


def _col_valid(U):
    """(m, r) 1.0 where the column is nonzero."""
    return (jnp.einsum("ilr,ilr->ir", U, U) > 0.25).astype(U.dtype)


@partial(
    jax.jit,
    static_argnames=("kb", "k_keep", "rf", "q", "res_tol"),
)
def _rsf_chunk_impl(
    C,
    rmask,
    tr_blk,
    G_ent,
    G_fill,
    *,
    kb: int,
    k_keep: int,
    rf: int,
    q: int,
    res_tol: float,
):
    """All-band entangled + filled frontend for one chunk of cuts.

    C: (L, L) f64 projector correlation matrix (device resident).
    rmask: (m, L) {0,1} block-row masks (side L: rows < x; side R: rows
        >= L - x) — one executable serves both sweep directions.
    tr_blk: (m,) block traces (host prefix sums of diag C).
    G_ent: (N_BANDS, L, r) random sketch block.
    G_fill: (L, rf) random filled sketch.

    Returns (slab (m, L, kb + rf) f64 frames, packed (m, 2*k_keep + 3)
    f32 host buffer: [lam ascending | 1 - lam | k, n_f, trace_resid]).
    """
    f64 = C.dtype
    m, L = rmask.shape
    omask = 1.0 - rmask

    def capp(V):  # C_LL V
        return rmask[:, :, None] * jnp.einsum(
            "ab,ibr->iar", C, rmask[:, :, None] * V
        )

    def mtapp(V):  # C_LR^T V   (V row-supported on the block)
        return omask[:, :, None] * jnp.einsum(
            "ab,ibr->iar", C, rmask[:, :, None] * V
        )

    def mapp(W):  # C_LR W     (W row-supported on the complement)
        return rmask[:, :, None] * jnp.einsum(
            "ab,ibr->iar", C, omask[:, :, None] * W
        )

    kept_U = []  # per band: (m, L, r) with zero columns for dropped lanes
    kept_lam = []  # per band: (m, r) with LAM_SENTINEL on dropped lanes

    def deflate(Z):
        for U in kept_U:
            Z = Z - jnp.einsum("ilk,ikr->ilr", U, jnp.einsum("ilk,ilr->ikr", U, Z))
        return Z

    los = list(BAND_EDGES) + [SIGMA_FLOOR]
    his = [np.inf] + list(BAND_EDGES)
    for b, (lo, hi) in enumerate(zip(los, his)):
        Y = deflate(mapp(jnp.broadcast_to(G_ent[b], (m, L, G_ent.shape[-1]))))
        U = _corth(Y, lo / 2.0)
        for _ in range(q):
            Z = deflate(mapp(mtapp(U)))
            U = _corth(Z, (lo / 2.0) ** 2)
        U = _corth(deflate(U), 0.5)
        valid = _col_valid(U)
        CU = capp(U)
        T = jnp.einsum("ilr,ils->irs", U, CU)
        T = T + jnp.einsum(
            "ir,rs->irs",
            (1.0 - valid) * _BIG,
            jnp.eye(T.shape[-1], dtype=f64),
        )
        lam, Wv = jnp.linalg.eigh(T)
        V = jnp.einsum("ilr,irs->ils", U, Wv)
        CV = capp(V)
        res = jnp.sqrt(jnp.einsum("ilr,ilr->ir", CV - lam[:, None, :] * V,
                                  CV - lam[:, None, :] * V))
        sig2 = lam * (1.0 - lam)
        hi_ext = np.inf if np.isinf(hi) else (4.0 * hi) ** 2
        keep = (sig2 >= lo * lo) & (res < res_tol) & (lam < 2.0)
        if np.isfinite(hi_ext):
            keep = keep & (sig2 < hi_ext)
        keep_f = keep.astype(f64)
        kept_U.append(V * keep_f[:, None, :])
        kept_lam.append(jnp.where(keep, lam, LAM_SENTINEL))

    lam_all = jnp.concatenate(kept_lam, axis=1)  # (m, N_BANDS * r)
    valid_all = lam_all < 2.0
    k_cnt = valid_all.sum(axis=1)  # (m,)
    lam_sum = jnp.where(valid_all, lam_all, 0.0).sum(axis=1)
    n_f_f = jnp.round(tr_blk - lam_sum)
    n_f = jnp.maximum(n_f_f, 0.0).astype(jnp.int32)
    tr_res = jnp.abs(tr_blk - lam_sum - n_f_f)

    # ---- filled basis: exact-size sketch of P C_LL P + CholeskyQR2 ----
    nf_mask = (
        jnp.arange(rf, dtype=jnp.int32)[None, :] < n_f[:, None]
    ).astype(f64)
    Yf = rmask[:, :, None] * jnp.broadcast_to(G_fill, (m, L, rf))
    Yf = Yf * nf_mask[:, None, :]
    Yf = deflate(capp(Yf))
    eye_rf = jnp.eye(rf, dtype=f64)
    for _ in range(2):
        Gf = jnp.einsum("ilr,ils->irs", Yf, Yf)
        Gf = Gf + jnp.einsum("ir,rs->irs", 1.0 - nf_mask, eye_rf)
        Rf = jax.lax.linalg.cholesky(Gf)
        Yf = jax.lax.linalg.triangular_solve(
            Rf, Yf, left_side=False, lower=True, transpose_a=True
        )

    # ---- frame assembly: [entangled ascending | filled] contiguous from
    # the first occupied column (col0 = x - n_f - k host-side) ----
    Wb = kb + rf
    lam_sort_key = jnp.where(valid_all, lam_all, LAM_SENTINEL)
    order = jnp.argsort(lam_sort_key, axis=1)
    rank = jnp.argsort(order, axis=1)  # ascending-lambda rank per column
    tpos = jnp.where(valid_all & (rank < kb), rank, Wb)
    U_all = jnp.concatenate(kept_U, axis=2)  # (m, L, N_BANDS * r)
    fpos = k_cnt[:, None] + jnp.arange(rf, dtype=jnp.int32)[None, :]
    fpos = jnp.where(nf_mask > 0.5, fpos, Wb)
    # exact one-hot placement via f32 splits (ops/linalg submatrix trick)
    from .linalg import _split_f32

    def place(V, pos):
        E = jax.nn.one_hot(pos, Wb + 1, dtype=jnp.float32)[..., :Wb]
        out = None
        for h in _split_f32(V):
            p = jnp.einsum(
                "ilk,iks->ils", h, E, precision="highest"
            ).astype(f64)
            out = p if out is None else out + p
        return out

    slab = place(U_all, tpos) + place(Yf, fpos)  # (m, L, kb + rf)

    # ---- packed f32 host buffer ----
    lam_sorted = jnp.take_along_axis(lam_sort_key, order, axis=1)[:, :k_keep]
    one_m = jnp.take_along_axis(
        jnp.where(valid_all, 1.0 - lam_all, LAM_SENTINEL), order, axis=1
    )[:, :k_keep]
    packed = jnp.concatenate(
        [
            lam_sorted.astype(jnp.float32),
            one_m.astype(jnp.float32),
            k_cnt[:, None].astype(jnp.float32),
            n_f[:, None].astype(jnp.float32),
            tr_res[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    return slab, packed


# --------------------------------------------------------------------------
# host driver
# --------------------------------------------------------------------------


def rsf_sweep_frames(C_host, sizes, side, cutoff, *, seed=1234):
    """Frames + spectra for all sweep cuts through the randomized frontend.

    Same contract as the compact host frontend
    (slater._compact_sweep_frames): returns ``(e_list, col0_list,
    frame_list, fallback)`` where ``e_list[i]`` is the full ascending
    eigenvalue array of cut i's block, ``frame_list[i]`` a device (L, Wb)
    frame whose columns are the occupied (> cutoff) eigenvectors in
    ascending order starting at full index ``col0_list[i]``, and
    ``fallback`` the cut indices the caller must route through the host
    LAPACK frontend (failed trace self-check, tiny blocks, or negative
    column offsets at the chain edges).

    The filled block of a frame is an orthonormal basis of the
    lambda~1 eigenspace, not individual eigenvectors: a bond-gauge
    rotation that every determinant consumer is invariant under (module
    docstring).  ``check_schmidt_decomposition`` (two-sided cuts) is
    never run on sweep frames.
    """
    from .. import profiling

    L = C_host.shape[0]
    n = len(sizes)
    r = rsf_rank()
    kb = rsf_kb()
    m = rsf_chunk()
    k_keep = kb
    # one fixed filled width: n_f <= n_fermion always; edge cuts that
    # cannot fit fall back (cheap LAPACK at small block sizes)
    n_fermion = int(np.round(float(np.trace(C_host).real)))
    rf = 32
    while rf < min(n_fermion + 8, L):
        rf *= 2
    rng = np.random.default_rng(seed)
    with profiling.stage("rsf/setup"):
        G_ent = jnp.asarray(rng.standard_normal((N_BANDS, L, r)))
        G_fill = jnp.asarray(rng.standard_normal((L, rf)))
        C_dev = jnp.asarray(C_host)
        diag_prefix = np.concatenate(([0.0], np.cumsum(np.diag(C_host))))
        total = diag_prefix[-1]

    iota = np.arange(L)
    results = []  # per chunk: (slab, sl)
    packed_parts = []
    for j0 in range(0, n, m):
        sl = [int(s) for s in sizes[j0 : j0 + m]]
        pad = sl + [sl[-1]] * (m - len(sl))
        if side == "L":
            rmask = (iota[None, :] < np.asarray(pad)[:, None]).astype(float)
            tr = diag_prefix[np.asarray(pad)]
        else:
            rmask = (iota[None, :] >= (L - np.asarray(pad))[:, None]).astype(
                float
            )
            tr = total - diag_prefix[L - np.asarray(pad)]
        with profiling.stage("rsf/dispatch"):
            slab, packed = _rsf_chunk_impl(
                C_dev,
                jnp.asarray(rmask),
                jnp.asarray(tr),
                G_ent,
                G_fill,
                kb=kb,
                k_keep=k_keep,
                rf=rf,
                q=POWER_STEPS,
                res_tol=RES_TOL,
            )
        results.append((slab, sl))
        packed_parts.append(packed)

    from ..slater import _take_frame

    # ONE download for the whole sweep: the tunnel pays a ~30 ms round
    # trip per transfer, so per-chunk downloads would serialize ~n/m RTTs
    with profiling.stage("rsf/download"):
        pk_all = np.asarray(jnp.concatenate(packed_parts, axis=0))

    e_list = [None] * n
    col0_list = [0] * n
    frame_list = [None] * n
    fallback = []
    i = 0
    for ci, (slab, sl) in enumerate(results):
        pk = pk_all[ci * m : ci * m + len(sl)]
        for t, x in enumerate(sl):
            k = int(pk[t, 2 * k_keep])
            n_f = int(pk[t, 2 * k_keep + 1])
            tr_res = float(pk[t, 2 * k_keep + 2])
            col0 = x - n_f - k
            if (
                tr_res > TRACE_TOL
                or k > min(k_keep, kb)
                or col0 < 0
                or n_f + 8 > rf
            ):
                fallback.append(i)
                i += 1
                continue
            lam32 = pk[t, :k].astype(np.float64)
            one_m32 = pk[t, k_keep : k_keep + k].astype(np.float64)
            # reconstruct f64-grade eigenvalues: small lambdas exact in
            # f32 absolutely; near-1 lambdas from the exact 1 - lambda
            lam = np.where(lam32 < 0.5, lam32, 1.0 - one_m32)
            e_full = np.concatenate(
                [np.zeros(x - n_f - k), np.sort(lam), np.ones(n_f)]
            )
            e_list[i] = e_full
            col0_list[i] = col0
            frame_list[i] = _take_frame(slab, jnp.asarray(t, jnp.int32))
            i += 1
    if fallback:
        logger.info(
            "rsf frontend: %d/%d cuts fell back to host LAPACK", len(fallback), n
        )
    return e_list, col0_list, frame_list, fallback
