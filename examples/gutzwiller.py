"""Gutzwiller-project a spinful free-fermion chain to a spin-1/2 MPS.

Pipeline (same contract as reference examples/gutzwiller.py, code is this
library's own): hopping chain -> spinful doubling with particle-hole
down-spins (spinful="PH") -> fermionic MPS -> abrikosov_ph projection to
the single-occupancy subspace -> Sz-resolved entanglement spectrum.

Run:  python examples/gutzwiller.py [L] [chi]
"""

import logging
import sys

import numpy as np

from temfpy_tpu import gutzwiller, setup_logging, slater


def main(L=32, chi=200):
    setup_logging(logging.INFO)
    hop = np.diag(-np.ones(L - 1), 1)
    H = hop + hop.T

    ferm = slater.H_to_MPS(H, {"chi_max": chi}, spinful="PH")
    spin = gutzwiller.abrikosov_ph(ferm, inplace=False,
                                   return_canonical=True)

    print(f"projected site: {spin.sites[0]}")
    print(f"chi: fermionic {ferm.chi_max} -> spin {spin.chi_max}")

    center = L // 2 - 1
    for (q,), levels in spin.entanglement_spectrum(by_charge=True)[center]:
        lead = ", ".join(f"{v:.4f}" for v in np.sort(levels)[:4])
        print(f"  2Sz = {q:+d}: leading levels {lead}")
    return spin


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
