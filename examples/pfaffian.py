"""Convert a Kitaev chain's BdG ground state to a finite MPS.

Physics check (same contract as reference examples/pfaffian.py, code is
this library's own): both the normal <c^dag_i c_j> and the anomalous
<c_i c_j> correlators of the MPS must match the BdG correlation matrix.

The Hamiltonian is written in the complex-fermion Nambu basis ("C") and
converted through the Majorana machinery internally — exercising both
basis layouts of temfpy_tpu.pfaffian.

Run:  python examples/pfaffian.py [L] [chi]
"""

import logging
import sys

import numpy as np

from temfpy_tpu import pfaffian, setup_logging


def kitaev_chain(L, *, t=1.0, mu=0.6, delta=0.8):
    """BdG Hamiltonian of the Kitaev chain in the complex Nambu basis:
    H = sum -t c^dag_i c_{i+1} - mu n_i + delta c_i c_{i+1} + h.c.,
    laid out as the 2L x 2L Nambu matrix [[h, Delta], [-Delta*, -h^T]]
    interleaved per site (pfaffian.assert_nambu layout "C")."""
    h = np.diag(-t * np.ones(L - 1), 1)
    h = h + h.T - mu * np.eye(L)
    D = np.diag(delta * np.ones(L - 1), 1)
    D = D - D.T
    H = np.zeros((2 * L, 2 * L), dtype=complex)
    H[0::2, 0::2] = h
    H[1::2, 1::2] = -h.T
    H[0::2, 1::2] = D
    H[1::2, 0::2] = -D.conj()
    pfaffian.assert_nambu_hamiltonian(H, basis="C")
    return H


def main(L=24, chi=128):
    setup_logging(logging.INFO)
    H = kitaev_chain(L)
    mps = pfaffian.H_to_MPS(H, {"chi_max": chi}, basis="C")

    C = np.asarray(pfaffian.correlation_matrix(H, basis="C->C"))
    normal = mps.correlation_function("Cd", "C").T
    anomalous = mps.correlation_function("C", "C").T
    dev_n = np.abs(normal - C[0::2, 0::2]).max()
    dev_a = np.abs(anomalous - C[0::2, 1::2]).max()
    print(f"max |<Cd C>_mps - C_normal|    = {dev_n:.3e}")
    print(f"max |<C C>_mps  - C_anomalous| = {dev_a:.3e}")
    print(f"vacuum parity sector of the chain: "
          f"{mps.get_total_charge() % 2}")
    return mps


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
