"""Tests of the randomized spectral frontend (ops/spectral.py).

Unit level: frames/spectra against per-cut LAPACK eigendecompositions.
Integration level: full conversions with TEMFPY_TPU_RSF=1 against the
default frontend, including a degenerate / cutoff-straddling model.
"""

import os

import numpy as np
import pytest

from temfpy_tpu import slater
from temfpy_tpu.ops.spectral import rsf_sweep_frames

CUTOFF = 1e-12  # svd_min**2 at the default svd_min = 1e-6


def cylinder_C(L, W=4, dimer=0.3, tilt=True):
    Lx = L // W
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                t = -1.0 - dimer * (x % 2)
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = t
            H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    if tilt:
        H -= 0.05 * np.eye(L)
    e, v = np.linalg.eigh(H)
    occ = v[:, e < -1e-9]
    return occ @ occ.T


@pytest.mark.parametrize("side", ["L", "R"])
def test_rsf_frames_match_lapack(side):
    L = 64
    C = cylinder_C(L, W=4)
    cuts = list(range(8, L - 7, 5))
    sizes = [x if side == "L" else L - x for x in cuts]
    e_list, col0_list, frames, fb = rsf_sweep_frames(C, sizes, side, CUTOFF)
    for i, x in enumerate(cuts):
        if i in fb:
            continue  # the caller routes these through LAPACK
        s = sizes[i]
        blk = C[:s, :s] if side == "L" else C[L - s :, L - s :]
        ee = np.linalg.eigh(blk)[0]
        e_mine = e_list[i]
        assert e_mine.shape == ee.shape
        # classification counts at the library cutoff agree
        sel = (ee > CUTOFF) & (ee < 1 - CUTOFF)
        sel_m = (e_mine > CUTOFF) & (e_mine < 1 - CUTOFF)
        assert sel.sum() == sel_m.sum(), f"cut {x}"
        # entangled eigenvalues agree at amplitude level
        np.testing.assert_allclose(
            np.sqrt(np.sort(e_mine[sel_m])),
            np.sqrt(np.sort(ee[sel])),
            atol=5e-7,
            rtol=0,
        )
        # frame columns: orthonormal, block-supported, invariant under C
        F = np.asarray(frames[i])
        col0 = col0_list[i]
        occ = F[:, : s - col0]
        rows = slice(None, s) if side == "L" else slice(L - s, None)
        out_rows = np.delete(np.arange(L), np.arange(L)[rows])
        assert np.abs(occ[out_rows]).max() < 1e-12
        Fb = occ[rows]
        G = Fb.T @ Fb
        np.testing.assert_allclose(G, np.eye(G.shape[0]), atol=1e-10)
        # each occupied column is (approximately) C_blk-invariant with the
        # synthesized eigenvalue (filled columns: any basis of the ~1
        # eigenspace)
        lam = e_mine[col0:]
        R = blk @ Fb - Fb * lam[None, :]
        assert np.abs(R).max() < 1e-6


def _convert(H, chi, rsf):
    old = os.environ.get("TEMFPY_TPU_RSF")
    os.environ["TEMFPY_TPU_RSF"] = rsf
    try:
        return slater.H_to_MPS(H, {"chi_max": chi})
    finally:
        if old is None:
            os.environ.pop("TEMFPY_TPU_RSF", None)
        else:
            os.environ["TEMFPY_TPU_RSF"] = old


def test_rsf_end_to_end_matches_default():
    """Full conversion with the randomized frontend reproduces the default
    frontend's state (overlap) and the input correlations."""
    L, W, chi = 48, 4, 96
    Lx = L // W
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                t = -1.0 if x % 2 == 0 else -1.3
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = t
            H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    H -= 0.05 * np.eye(L)
    H -= 1e-4 * np.diag(np.arange(L))

    m_ref = _convert(H, chi, "0")
    m_rsf = _convert(H, chi, "1")
    C = np.asarray(slater.correlation_matrix(H)[0])
    dev_ref = np.abs(m_ref.correlation_function("Cd", "C").T - C).max()
    dev_rsf = np.abs(m_rsf.correlation_function("Cd", "C").T - C).max()
    # the randomized frontend must not degrade the conversion quality
    assert dev_rsf < max(3 * dev_ref, 1e-8)
    ov = abs(m_ref.overlap(m_rsf))
    ov_self = abs(m_ref.overlap(m_ref))
    assert ov > 0.999 * ov_self


def test_rsf_degenerate_cutoff_straddling():
    """Exactly degenerate cylinder modes + eigenvalues straddling the
    svd_min^2 cutoff: the frontend must classify consistently or fall
    back, never mangle the state (VERDICT round-3 ask: degeneracy
    regression for the device frontend)."""
    L = 64
    C = cylinder_C(L, W=4, dimer=0.0, tilt=False)  # exact degeneracies
    cuts = list(range(6, L - 5, 3))
    e_list, col0_list, frames, fb = rsf_sweep_frames(C, cuts, "L", CUTOFF)
    assert len(fb) < len(cuts)  # the frontend handles most cuts itself
    for i, x in enumerate(cuts):
        if i in fb:
            continue
        ee = np.linalg.eigh(C[:x, :x])[0]
        sel = (ee > CUTOFF) & (ee < 1 - CUTOFF)
        e_mine = e_list[i]
        sel_m = (e_mine > CUTOFF) & (e_mine < 1 - CUTOFF)
        # counts may differ ONLY by true cutoff straddlers (within 30x of
        # the cutoff) — never by mid-spectrum modes
        if sel.sum() != sel_m.sum():
            near = ((ee > CUTOFF / 30) & (ee < CUTOFF * 30)).sum()
            assert abs(int(sel.sum()) - int(sel_m.sum())) <= near
            continue
        np.testing.assert_allclose(
            np.sqrt(np.sort(e_mine[sel_m])),
            np.sqrt(np.sort(ee[sel])),
            atol=5e-7,
            rtol=0,
        )
