"""Tests for the truncation policy and subset enumeration
(semantics of reference schmidt_utils.py:18-324)."""

import itertools

import numpy as np
import pytest

import temfpy_tpu.schmidt_utils as su
from temfpy_tpu.schmidt_utils import StoppingCondition, lowest_sums, to_stopping_condition


def heap_lowest_sums(a, sc, **kw):
    """The reference heap enumeration (batched fast path disabled)."""
    prev = su._USE_BATCHED
    su._USE_BATCHED = False
    try:
        return lowest_sums(a, sc, **kw)
    finally:
        su._USE_BATCHED = prev


def brute_force_lowest_sums(a, k):
    """All 2^n subsets sorted by sum; returns first k (sums, sets)."""
    n = len(a)
    subsets = list(itertools.product([False, True], repeat=n))
    sums = [sum(x for x, s in zip(a, sub) if s) for sub in subsets]
    order = np.argsort(sums, kind="stable")
    return (
        np.asarray(sums)[order][:k],
        np.asarray(subsets, dtype=bool)[order][:k],
    )


def test_defaults():
    sc = StoppingCondition()
    assert sc.svd_min == 1e-6
    assert sc.degeneracy_tol == 1e-12
    assert sc.is_sector(42)


def test_to_stopping_condition():
    sc = to_stopping_condition({"chi_max": 7})
    assert sc.chi_max == 7
    assert to_stopping_condition(sc) is sc
    with pytest.raises(TypeError):
        to_stopping_condition([1, 2])


def test_sector_forms():
    assert StoppingCondition(sectors=3).is_sector(3)
    assert not StoppingCondition(sectors=3).is_sector(4)
    sc = StoppingCondition(sectors=[1, 2])
    assert sc.is_sector(1) and sc.is_sector(2) and not sc.is_sector(3)
    sc = StoppingCondition(sectors=lambda q: q % 2 == 0)
    assert sc.is_sector(4) and not sc.is_sector(5)


def test_truncate_chi_max():
    sc = StoppingCondition(chi_max=3, svd_min=1e-10)
    logvals = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    assert sc.truncate(logvals) == 3


def test_truncate_degeneracy():
    # cannot cut inside the degenerate pair at positions 2,3
    sc = StoppingCondition(chi_max=3, svd_min=1e-10, degeneracy_tol=1e-8)
    logvals = np.array([0.0, 1.0, 2.0, 2.0 + 1e-12, 4.0])
    assert sc.truncate(logvals) == 2


def test_truncate_svd_min():
    sc = StoppingCondition(svd_min=np.exp(-2.5))
    logvals = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    assert sc.truncate(logvals) == 3


def test_lowest_sums_vs_bruteforce():
    rng = np.random.default_rng(1)
    for trial in range(20):
        n = rng.integers(1, 10)
        a = rng.normal(size=n)
        chi = int(rng.integers(1, 12))
        sc = StoppingCondition(chi_max=chi, svd_min=1e-12)
        sums, sets = lowest_sums(a, sc)
        k = len(sums)
        bf_sums, _ = brute_force_lowest_sums(a, k)
        np.testing.assert_allclose(sums, bf_sums, atol=1e-12)
        # sets must reproduce sums
        np.testing.assert_allclose(sets @ a, sums, atol=1e-12)
        assert k <= chi


def test_lowest_sums_sector_filter():
    a = np.array([0.5, 1.0, 1.5, -0.25])
    sc = StoppingCondition(chi_max=8, svd_min=1e-12, sectors=2)
    sums, sets = lowest_sums(a, sc, filled_left=1)
    # every kept set must have exactly 1 occupied orbital (1 filled + 1 = 2)
    assert np.all(sets.sum(axis=1) == 1)
    assert np.all(np.diff(sums) >= -1e-15)


def test_lowest_sums_sector_filter_right():
    a = np.array([0.5, 1.0, -0.3])
    sc = StoppingCondition(chi_max=20, svd_min=1e-12, sectors=lambda q: q <= 4)
    sums, sets = lowest_sums(a, sc, filled_right=2)
    n_right = 2 + (a.size - sets.sum(axis=1))
    assert np.all(n_right <= 4)


def test_lowest_sums_empty_array():
    sc = StoppingCondition(chi_max=4)
    sums, sets = lowest_sums(np.zeros(0), sc)
    assert sums.shape == (1,) and sets.shape == (1, 0)
    sc = StoppingCondition(chi_max=4, sectors=5)
    sums, sets = lowest_sums(np.zeros(0), sc, filled_left=3)
    assert sums.shape == (0,)


def test_lowest_sums_first_set_filtered():
    # the minimum-sum set is out-of-sector: enumeration must continue past it
    a = np.array([-1.0, 0.5])
    sc = StoppingCondition(chi_max=4, svd_min=1e-3, sectors=lambda q: q != 1)
    sums, sets = lowest_sums(a, sc)
    assert len(sums) >= 1
    assert all(s.sum() != 1 for s in sets)


def test_lowest_sums_batched_matches_heap():
    """The vectorised trivial-sector path must reproduce the heap
    enumeration exactly: same sums, same subsets, same truncation; on
    tie-free inputs, the same order."""
    rng = np.random.default_rng(42)
    for trial in range(60):
        m = int(rng.integers(0, 20))
        a = rng.normal(size=m) * rng.uniform(0.3, 4)
        if trial % 3 == 0 and m > 3:  # exact degeneracies
            a[1] = a[0]
            a[m // 2] = -a[0]
        kw = {}
        r = rng.random()
        if r < 0.5:
            kw["chi_max"] = int(rng.integers(1, 150))
        else:
            kw["svd_min"] = float(np.exp(-rng.uniform(1, 5)))
            if m > 14:
                kw["chi_max"] = 300
        fl = (
            {"filled_left": int(rng.integers(0, 4))}
            if rng.random() < 0.5
            else {}
        )
        s_f, x_f = lowest_sums(a, StoppingCondition(**kw), **fl)
        s_h, x_h = heap_lowest_sums(a, StoppingCondition(**kw), **fl)
        assert len(s_f) == len(s_h)
        np.testing.assert_allclose(s_f, s_h, rtol=0, atol=1e-12)
        key = lambda s, x: sorted(  # noqa: E731
            (round(float(v), 9), tuple(np.flatnonzero(row)))
            for v, row in zip(s, x)
        )
        assert key(s_f, x_f) == key(s_h, x_h)
        if len(np.unique(np.round(s_h, 12))) == len(s_h):
            assert np.array_equal(x_f, x_h), "order differs on tie-free input"


def test_lowest_sums_wide_matches_heap():
    """m > 64 (multi-word flip masks) must still match the heap — the
    production L=1024 cuts carry > 63 entangled modes per cut, where a
    uint64-masked fast path silently regressed to the heap in round 4."""
    rng = np.random.default_rng(3)
    for trial in range(8):
        m = int(rng.integers(64, 150))
        a = rng.normal(size=m) * rng.uniform(0.5, 3)
        kw = {"chi_max": int(rng.integers(16, 80)), "svd_min": 1e-9}
        fl = {"filled_left": 2} if trial % 2 else {}
        if trial >= 6:
            kw["sectors"] = lambda q, _p=trial % 2: q % 2 == _p
        s_f, x_f = lowest_sums(a, StoppingCondition(**kw), **fl)
        s_h, x_h = heap_lowest_sums(a, StoppingCondition(**kw), **fl)
        assert len(s_f) == len(s_h)
        np.testing.assert_allclose(s_f, s_h, rtol=0, atol=1e-12)
        np.testing.assert_allclose(x_f @ a, s_f, atol=1e-12)
        if len(np.unique(np.round(s_h, 12))) == len(s_h):
            assert np.array_equal(x_f, x_h)


def test_lowest_sums_sector_batched_matches_heap():
    """The sector-filtered vectorised path must reproduce the heap: same
    kept sums, same subsets, same truncation — across predicate forms
    (int, iterable, callable), filled_left/right conventions, out-of-sector
    bases, and sparse sectors that force the bound to widen."""
    rng = np.random.default_rng(7)
    for trial in range(120):
        m = int(rng.integers(0, 16))
        a = rng.normal(size=m) * rng.uniform(0.3, 4)
        if trial % 4 == 0 and m > 3:  # exact degeneracies
            a[1] = a[0]
            a[m // 2] = -a[0]
        kw = {}
        if rng.random() < 0.7:
            kw["chi_max"] = int(rng.integers(1, 60))
        if rng.random() < 0.5:
            kw["svd_min"] = float(np.exp(-rng.uniform(1, 6)))
        r = rng.random()
        if r < 0.3:
            kw["sectors"] = int(rng.integers(0, m + 3))
        elif r < 0.6:
            kw["sectors"] = [
                int(q) for q in rng.integers(0, m + 3, size=rng.integers(1, 4))
            ]
        elif r < 0.9:
            par = int(rng.integers(0, 2))
            kw["sectors"] = lambda q, _p=par: q % 2 == _p
        else:
            # sparse far sector: only reachable near max occupation, so
            # the iterative bound widening must engage
            kw["sectors"] = lambda q, _m=m: q >= _m - 1
        fl = {}
        fr = rng.random()
        if fr < 0.4:
            fl["filled_left"] = int(rng.integers(0, 4))
        elif fr < 0.7:
            fl["filled_right"] = int(rng.integers(0, 4))
        sc = StoppingCondition(**kw)
        try:
            s_h, x_h = heap_lowest_sums(a, sc, **fl)
        except Exception as exc:  # pathological: no sector match at all
            with pytest.raises(type(exc)):
                lowest_sums(a, sc, **fl)
            continue
        s_f, x_f = lowest_sums(a, sc, **fl)
        assert len(s_f) == len(s_h), (trial, len(s_f), len(s_h))
        np.testing.assert_allclose(s_f, s_h, rtol=0, atol=1e-12)
        key = lambda s, x: sorted(  # noqa: E731
            (round(float(v), 9), tuple(np.flatnonzero(row)))
            for v, row in zip(s, x)
        )
        assert key(s_f, x_f) == key(s_h, x_h), trial
        if len(np.unique(np.round(s_h, 12))) == len(s_h):
            assert np.array_equal(x_f, x_h), "order differs on tie-free input"
