r"""Split-complex device linear algebra: complex arrays as (re, im) f64 planes.

The axon TPU v5e runtime has no usable complex support (complex128
``device_put`` blocks; complex64 executables raise UNIMPLEMENTED — see
BASELINE.md platform notes), but real float64 elementwise/matmul ops run at
full speed.  These helpers carry complex matrices as pairs of real device
arrays so the Pfaffian (BdG) conversion pipeline — the reference's second
state class (reference pfaffian.py:1258-1426) — executes its hot linear
algebra on the TPU: the per-site basis-change matmuls, the U-block inverse,
and the N-matrix assembly of :func:`temfpy_tpu.pfaffian._pfaffian_matrix`.

Complex values never materialise on the device; conversions happen on the
host at the API boundary.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import real_dtype  # noqa: F401  (x64 side effect)
from .linalg import gauss_solve_det


def sc_put(a):
    """Host complex array -> (re, im) device planes."""
    a = np.asarray(a)
    return jnp.asarray(np.ascontiguousarray(a.real)), jnp.asarray(
        np.ascontiguousarray(a.imag)
    )


def sc_get(pair) -> np.ndarray:
    """(re, im) planes -> host complex array."""
    re, im = pair
    return np.asarray(re) + 1j * np.asarray(im)


@jax.jit
def _sc_matmul_impl(ar, ai, br, bi):
    return ar @ br - ai @ bi, ar @ bi + ai @ br


def sc_matmul(a, b):
    """Matrix product of two split-complex pairs."""
    return _sc_matmul_impl(a[0], a[1], b[0], b[1])


@jax.jit
def _sc_matmul_ht_impl(ar, ai, br, bi):
    # (A^H B): (ar - i ai)^T (br + i bi)
    return ar.T @ br + ai.T @ bi, ar.T @ bi - ai.T @ br


def sc_matmul_ht(a, b):
    """A^H @ B for split-complex pairs (the basis-change product
    Vr = V1^H V2 of reference pfaffian.py:1339)."""
    return _sc_matmul_ht_impl(a[0], a[1], b[0], b[1])


@jax.jit
def _sc_inverse_impl(ar, ai):
    """Inverse of (ar + i ai) via the real embedding [[ar, -ai], [ai, ar]]
    and the TPU-safe Gauss-Jordan solve (no LuDecomposition op)."""
    m = ar.shape[0]
    B = jnp.block([[ar, -ai], [ai, ar]])
    eye = jnp.eye(2 * m, dtype=ar.dtype)
    _det, X = gauss_solve_det(B, eye)
    return X[:m, :m], X[m:, :m]


def sc_inverse(a):
    """Matrix inverse of a split-complex pair."""
    return _sc_inverse_impl(a[0], a[1])


def sc_take(a, rows=None, cols=None):
    """Row/column gather on both planes (host or device index arrays)."""
    re, im = a
    if rows is not None:
        rows = jnp.asarray(rows, jnp.int32)
        re, im = re[rows, :], im[rows, :]
    if cols is not None:
        cols = jnp.asarray(cols, jnp.int32)
        re, im = re[:, cols], im[:, cols]
    return re, im


def sc_block2(a11, a12, a21, a22):
    """2x2 block assembly on both planes."""
    re = jnp.block([[a11[0], a12[0]], [a21[0], a22[0]]])
    im = jnp.block([[a11[1], a12[1]], [a21[1], a22[1]]])
    return re, im


@jax.jit
def _sc_antisym_impl(ar, ai):
    return (ar - ar.T) / 2, (ai - ai.T) / 2


def sc_antisymmetrize(a):
    """(A - A^T) / 2 on both planes."""
    return _sc_antisym_impl(a[0], a[1])


def _nambu_full(Vr_h, Vi_h):
    """Reconstructs full (2nb, 2nb) Nambu mode-matrix planes from the
    first nb (annihilator) columns: with site-interleaved rows
    (c_1, c^dag_1, c_2, ...), the creator column of mode j is the complex
    conjugate of its annihilator column with even/odd rows swapped —
    bit-exact (measured 0.0 over full conversions), so only half of every
    frame crosses the tunnel (the frame upload dominated the Pfaffian
    tensor_plan stage at the p+ip stress config, BASELINE.md round 3)."""
    nb = Vr_h.shape[0] // 2
    swap_r = Vr_h.reshape(nb, 2, -1)[:, ::-1, :].reshape(2 * nb, -1)
    swap_i = Vi_h.reshape(nb, 2, -1)[:, ::-1, :].reshape(2 * nb, -1)
    return (
        jnp.concatenate([Vr_h, swap_r], axis=1),
        jnp.concatenate([Vi_h, -swap_i], axis=1),
    )


@jax.jit
def pf_overlap_kernel(V1r, V1i, V2r, V2i, j1, j2):
    r"""Fused per-site overlap preparation of the Pfaffian tensor fill
    (split-complex, bucketed shapes — one executable per shape bucket).

    Computes, for (2nb, 2nb) Nambu mode-matrix planes V1/V2 (identically
    vacuum-padded to the bucket size nb, original modes at positions
    [0, n) of each half):

    - the basis change  Vr = V1^H V2          (reference pfaffian.py:1339)
    - U*^{-1} = inv(Vr[nb:, nb:]) via the real 2x2-block embedding and the
      TPU-safe Gauss-Jordan solve; its determinant det_embed = |det U|^2
      gives the Onishi vacuum overlap  norm = det_embed^{1/4}
      (reference pfaffian.py:1352-1359: prod of singular values = |det|)
    - the overlap blocks AA = Vr[j1, nb:] @ U*^{-1}[:, j1],
      BA = U*^{-1}[j2, j1], BB = U*^{-1}[j2, :] @ Vr[nb:, j2]
      (reference pfaffian.py:1384-1400), antisymmetrised and assembled as
      N = [[BB, BA], [-BA^T, AA]]

    Returns (Nr, Ni, det_embed, Vrr, Vri); the Vr planes are returned for
    the optional host-side Nambu contract checks.
    """
    nb = V1r.shape[0] // 2
    Vrr = V1r.T @ V2r + V1i.T @ V2i
    Vri = V1r.T @ V2i - V1i.T @ V2r
    Uxr, Uxi = Vrr[nb:, nb:], Vri[nb:, nb:]
    B = jnp.block([[Uxr, -Uxi], [Uxi, Uxr]])
    eye = jnp.eye(2 * nb, dtype=Uxr.dtype)
    det_embed, X = gauss_solve_det(B, eye)
    Uir, Uii = X[:nb, :nb], X[nb:, :nb]
    # AA = Vr[j1, nb:] @ Uxinv[:, j1]
    Ar, Ai = Vrr[j1, nb:], Vri[j1, nb:]
    Br, Bi = Uir[:, j1], Uii[:, j1]
    AAr = Ar @ Br - Ai @ Bi
    AAi = Ar @ Bi + Ai @ Br
    BAr = Uir[j2[:, None], j1[None, :]]
    BAi = Uii[j2[:, None], j1[None, :]]
    Cr, Ci = Uir[j2, :], Uii[j2, :]
    Dr, Di = Vrr[nb:, j2], Vri[nb:, j2]
    BBr = Cr @ Dr - Ci @ Di
    BBi = Cr @ Di + Ci @ Dr
    # pre-antisymmetrisation asymmetry (the Nambu contract of reference
    # pfaffian.py:1394-1397), reported as scalars for the checked mode
    aa_asym = jnp.maximum(
        jnp.abs(AAr + AAr.T).max(), jnp.abs(AAi + AAi.T).max()
    )
    bb_asym = jnp.maximum(
        jnp.abs(BBr + BBr.T).max(), jnp.abs(BBi + BBi.T).max()
    )
    AAr, AAi = (AAr - AAr.T) / 2, (AAi - AAi.T) / 2
    BBr, BBi = (BBr - BBr.T) / 2, (BBi - BBi.T) / 2
    Nr = jnp.block([[BBr, BAr], [-BAr.T, AAr]])
    Ni = jnp.block([[BBi, BAi], [-BAi.T, AAi]])
    return Nr, Ni, det_embed, Vrr, Vri, aa_asym, bb_asym


pf_overlap_group = jax.jit(jax.vmap(pf_overlap_kernel))
"""Vmapped :func:`pf_overlap_kernel` over a stack of sites sharing one
shape bucket — the conversion drivers group per-site overlap preparations
into one executable and one fused frame upload (dispatch latency and
per-transfer round trips dominate the per-site variant on the tunnel)."""


def _pf_overlap_kernel_half(V1r, V1i, V2r, V2i, j1, j2):
    """:func:`pf_overlap_kernel` taking (2nb, nb) annihilator-column
    planes; the creator halves are reconstructed on device
    (:func:`_nambu_full`)."""
    V1r, V1i = _nambu_full(V1r, V1i)
    V2r, V2i = _nambu_full(V2r, V2i)
    return pf_overlap_kernel.__wrapped__(V1r, V1i, V2r, V2i, j1, j2)


pf_overlap_group_half = jax.jit(jax.vmap(_pf_overlap_kernel_half))
"""Vmapped half-frame overlap kernel (one fused half-frame upload per
shape bucket; halves the dominant tensor_plan transfer volume)."""
