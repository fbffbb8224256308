"""Direct Hamiltonian -> infinite MPS for a gapped Majorana (Kitaev-type)
chain, validated by cell splicing.

Same contract as reference examples/iMPS_pfaffian.py (parity-conserving
H_to_iMPS in the Majorana basis + reconstruction overlap); the code is
this library's own.

Run:  python examples/iMPS_pfaffian.py [L] [n_cells]
"""

import sys

import numpy as np

from temfpy_tpu import pfaffian

CELL = 1


def majorana_dimer_H(L, t_strong=1.5, t_weak=1.0):
    """Dimerized Majorana hopping i t_k gamma_k gamma_{k+1} — gapped for
    t_strong != t_weak (the Kitaev chain off criticality)."""
    hop = np.empty(2 * L - 1, dtype=complex)
    hop[0::2] = 1j * t_strong
    hop[1::2] = 1j * t_weak
    M = np.diag(hop, 1)
    return M + M.conj().T


def main(L=64, n_cells=8, chi=100):
    trunc = {"chi_max": chi}
    cut = L // 2
    cell, err = pfaffian.H_to_iMPS(
        majorana_dimer_H(L), majorana_dimer_H(L + CELL), trunc, CELL, cut,
        basis="M",
    )
    print(f"gauge errors: {err}")

    short = pfaffian.H_to_MPS(majorana_dimer_H(L), trunc, basis="M")
    target = pfaffian.H_to_MPS(
        majorana_dimer_H(L + n_cells * CELL), trunc, basis="M"
    )
    rebuilt = short.splice(cell, cut, n_cells)
    print(f"overlap after splicing {n_cells} cells: "
          f"{abs(target.overlap(rebuilt)):.10f}")
    return cell


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
