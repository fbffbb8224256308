"""Gutzwiller projection of a spinful hopping chain to a spin-1/2 MPS and its
entanglement spectrum by Sz sector (mirrors reference examples/gutzwiller.py,
printing instead of plotting)."""

import logging

import numpy as np

from temfpy_tpu import gutzwiller, setup_logging, slater

setup_logging(logging.INFO)


def hoppingH(L, t=-1):
    M = np.diag(t * np.ones(L - 1), 1)
    return M + M.T


L = 32
chi = 200

mps_ferm = slater.H_to_MPS(hoppingH(L), {"chi_max": chi}, spinful="PH")
mps_spin = gutzwiller.abrikosov_ph(mps_ferm, inplace=False, return_canonical=True)

print(mps_spin.sites[0])

spectrum = mps_spin.entanglement_spectrum(by_charge=True)
bond = L // 2
for (q,), s in spectrum[bond - 1]:
    print(f"2Sz = {q}: lowest levels {np.sort(s)[:4]}")
