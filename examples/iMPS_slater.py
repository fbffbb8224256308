"""Direct Hamiltonian -> infinite MPS through the correlation-matrix
route (no transfer-matrix contractions), validated by cell splicing.

slater.H_to_iMPS computes the gauge overlap from Slater determinant
overlap formulas instead of contracting tensor networks (reference
slater.py:1356-1565 route); the splice/overlap validation matches
reference examples/iMPS_slater.py, the code is this library's own.

Run:  python examples/iMPS_slater.py [L] [n_cells]
"""

import sys

import numpy as np

from temfpy_tpu import slater

CELL = 2


def dimer_H(L, t_strong=-1.6, t_weak=-1.0):
    hop = np.empty(L - 1)
    hop[0::2] = t_strong
    hop[1::2] = t_weak
    M = np.diag(hop, 1)
    return M + M.T


def main(L=128, n_cells=8, chi=100):
    trunc = {"chi_max": chi}
    cut = L // 2
    cell, err = slater.H_to_iMPS(
        dimer_H(L), dimer_H(L + CELL), trunc, CELL, cut, offset=0
    )
    print(f"gauge errors: {err}")

    short = slater.H_to_MPS(dimer_H(L), trunc)
    target = slater.H_to_MPS(dimer_H(L + n_cells * CELL), trunc)
    rebuilt = short.splice(cell, cut, n_cells)
    print(f"overlap after splicing {n_cells} cells: "
          f"{abs(target.overlap(rebuilt)):.10f}")
    return cell


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
