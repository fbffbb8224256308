"""The Fishman-White sweep prototype (round-3 groundwork): frozen-mode
error decays with window width and the rotation network reproduces C."""

import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from prototypes.fishman_white import gapped_chain_C, reconstruct, sweep


def test_fw_sweep_converges():
    L = 48
    C = gapped_chain_C(L)
    prev = None
    for w in (4, 8, 10):
        rot, nf, err = sweep(C, w)
        dev = np.abs(reconstruct(rot, nf, L) - C).max()
        assert len(rot) < L * w
        if prev is not None:
            assert err.max() < prev  # exponential decay in w
        prev = max(err.max(), 1e-14)
    assert err.max() < 1e-10
    assert dev < 1e-6
