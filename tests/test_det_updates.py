"""Rank-update determinant path: unit tests of the swap kernel and
end-to-end equivalence with the direct identity-padded LU path."""

import numpy as np
import pytest

import jax.numpy as jnp

import temfpy_tpu.slater as sl
from temfpy_tpu import slater
from temfpy_tpu.ops.linalg import (
    _det_swaps_body,
    block_diag_identity_pad,
    det_swap_tables,
    lu_det,
    perm_parity_rows,
)


def test_det_swaps_kernel_vs_direct():
    """det(M[R, C]) = D0 * sign * det(S) for random row/col swaps."""
    rng = np.random.default_rng(3)
    m, w, pad = 14, 6, 4
    M = rng.normal(size=(m, m))
    M_aug = np.asarray(block_diag_identity_pad(jnp.asarray(M), pad))
    base_r = np.sort(rng.choice(m, w, replace=False))
    base_c = np.sort(rng.choice(m, w, replace=False))
    r0 = np.concatenate([base_r, m + np.arange(pad)]).astype(np.int32)
    c0 = np.concatenate([base_c, m + np.arange(pad)]).astype(np.int32)
    D0, G, P, T2, T3 = det_swap_tables(jnp.asarray(M_aug), jnp.asarray(r0),
                                       jnp.asarray(c0))

    a_b, b_b = 2, 2
    n = 64
    rin = np.empty((n, a_b), np.int32)
    rout = np.empty((n, a_b), np.int32)
    rpos = np.empty((n, a_b), np.int32)
    cin = np.empty((n, b_b), np.int32)
    cout = np.empty((n, b_b), np.int32)
    cpos = np.empty((n, b_b), np.int32)
    want = np.empty(n)
    for t in range(n):
        a = rng.integers(0, a_b + 1)
        b = rng.integers(0, b_b + 1)
        # swap out `a` base rows for new ones, self-swap the padding slots
        pos_r = rng.choice(w, a_b, replace=False)
        avail = np.setdiff1d(np.arange(m), base_r)
        new_r = rng.choice(avail, a, replace=False)
        rpos[t] = pos_r
        rout[t] = base_r[pos_r]
        rin[t, :a] = new_r
        rin[t, a:] = base_r[pos_r[a:]]  # self-swaps
        pos_c = rng.choice(w, b_b, replace=False)
        availc = np.setdiff1d(np.arange(m), base_c)
        new_c = rng.choice(availc, b, replace=False)
        cpos[t] = pos_c
        cout[t] = base_c[pos_c]
        cin[t, :b] = new_c
        cin[t, b:] = base_c[pos_c[b:]]
        R = np.sort(np.concatenate([np.delete(base_r, pos_r[:a]), new_r]))
        C = np.sort(np.concatenate([np.delete(base_c, pos_c[:b]), new_c]))
        want[t] = np.linalg.det(M[np.ix_(R, C)])
    sign = perm_parity_rows(r0[:w].astype(np.int64), rpos, rin) * \
        perm_parity_rows(c0[:w].astype(np.int64), cpos, cin)
    got = np.asarray(_det_swaps_body(
        jnp.asarray(M_aug), G, P, T2, T3, D0, jnp.asarray(sign),
        jnp.asarray(rin), jnp.asarray(rout), jnp.asarray(rpos),
        jnp.asarray(cin), jnp.asarray(cout), jnp.asarray(cpos),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def _bench_model(L, W=8):
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
    return H


def test_swap_path_matches_direct_path(monkeypatch):
    """Full conversion through the rank-update path is (numerically) the
    same state as through the direct path."""
    H = _bench_model(32, W=8)  # wide cylinder: classes well above c = 4
    C, _ = slater.correlation_matrix(H)

    monkeypatch.setenv("TEMFPY_TPU_DET_UPDATES", "0")
    mps_direct = slater.C_to_MPS(C, {"chi_max": 96})
    monkeypatch.setenv("TEMFPY_TPU_DET_UPDATES", "1")
    mps_swap = slater.C_to_MPS(C, {"chi_max": 96})

    n0 = mps_direct.norm_squared()
    n1 = mps_swap.norm_squared()
    f = abs(mps_direct.overlap(mps_swap)) / (n0 * n1) ** 0.5
    assert f > 1 - 1e-10, f"cross-path fidelity {f}"
    # tensors should in fact agree entry-wise (same gauge, same algorithm)
    for a, b in zip(mps_direct._B, mps_swap._B):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_swap_collapse_matches_fine_buckets(monkeypatch):
    """The collapsed single-shape-family swap plan (TPU cold-compile fix:
    pad width = sometimes bucket, fixed 8-wide tables, one s_b=8 bucket)
    produces the same tensors as the fine-grained CPU buckets."""
    H = _bench_model(32, W=8)
    C, _ = slater.correlation_matrix(H)

    monkeypatch.setenv("TEMFPY_TPU_DET_UPDATES", "1")
    monkeypatch.setenv("TEMFPY_TPU_SWAP_COLLAPSE", "0")
    mps_fine = slater.C_to_MPS(C, {"chi_max": 96})
    monkeypatch.setenv("TEMFPY_TPU_SWAP_COLLAPSE", "1")
    mps_flat = slater.C_to_MPS(C, {"chi_max": 96})

    n0 = mps_fine.norm_squared()
    n1 = mps_flat.norm_squared()
    f = abs(mps_fine.overlap(mps_flat)) / (n0 * n1) ** 0.5
    assert f > 1 - 1e-10, f"cross-path fidelity {f}"
    for a, b in zip(mps_fine._B, mps_flat._B):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def _piflux_model(W=4, Lx=8):
    """The BASELINE config-4 pi-flux cylinder (bench.py): symmetry-degenerate
    Schmidt spectra whose rank-update classes hit near-singular INTERMEDIATE
    swap configurations that the base-table pre-screen cannot see."""
    L = W * Lx
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = (
                    -1.0 if y % 2 == 0 else 1.0
                )
            H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    H -= 1e-4 * np.diag(np.arange(L))
    return H


def test_swap_probe_no_wasted_dispatch(monkeypatch, caplog):
    """On the pi-flux ansatz, every failing rank-update class must be
    caught by the pre-screen or the checked-subset probe BEFORE its full
    swap batch dispatches: zero resolve-time cross-check warnings, zero
    wasted dispatches, and the result identical to the direct path
    (round-4 VERDICT: six cross-check-failure warnings per bench lap)."""
    import logging

    H = _piflux_model()
    C, _ = slater.correlation_matrix(H)
    from temfpy_tpu.slater import spinful_correlation_matrix

    C2 = spinful_correlation_matrix(C, True)

    monkeypatch.setenv("TEMFPY_TPU_DET_UPDATES", "0")
    mps_direct = slater.C_to_MPS(C2, {"chi_max": 128})

    monkeypatch.setenv("TEMFPY_TPU_DET_UPDATES", "1")
    with caplog.at_level(logging.WARNING, logger="temfpy_tpu.slater"):
        mps_swap = slater.C_to_MPS(C2, {"chi_max": 128})
    warns = [r for r in caplog.records if "cross-check failed" in r.message]
    assert not warns, [r.message for r in warns]
    st = sl._swap_stats()
    assert st["wasted"] == 0, st
    assert st["classes"] > 0, "swap path never engaged"

    for a, b in zip(mps_direct._B, mps_swap._B):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_swap_path_exercised():
    """The bench-model conversion actually routes pairs through the
    rank-update path (guard against silently falling back to direct)."""
    H = _bench_model(32, W=8)
    C, _ = slater.correlation_matrix(H)
    counts = {"swap": 0, "direct": 0}
    orig = sl.MPSTensorData._plan_fill

    def patched(self):
        out = orig(self)
        for plan in out[3]:
            counts["swap" if plan["kind"] != "direct" else "direct"] += 1
        return out

    sl.MPSTensorData._plan_fill = patched
    try:
        slater.C_to_MPS(C, {"chi_max": 96})
    finally:
        sl.MPSTensorData._plan_fill = orig
    assert counts["swap"] > 0, counts
