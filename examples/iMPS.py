"""Extract an infinite MPS from two finite conversions of a dimerized
chain, then validate it by splicing cells back into the finite state.

Route (same contract as reference examples/iMPS.py, code is this
library's own): convert chains of length L and L + cell, hand both to
iMPS.MPS_to_iMPS, splice n extra unit cells into the short chain with
MPS.splice, and overlap against a directly-converted longer chain.

Run:  python examples/iMPS.py [L] [n_cells]
"""

import sys

import numpy as np

from temfpy_tpu import iMPS, slater

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
    short = slater.H_to_MPS(dimer_H(L), trunc)
    long_ = slater.H_to_MPS(dimer_H(L + CELL), trunc)

    cell, err = iMPS.MPS_to_iMPS(short, long_, CELL, cut, offset=0)
    print(f"gauge errors: {err}")

    rebuilt = short.splice(cell, cut, n_cells)
    target = slater.H_to_MPS(dimer_H(L + n_cells * CELL), trunc)
    print(f"overlap after splicing {n_cells} cells: "
          f"{abs(target.overlap(rebuilt)):.10f}")
    return cell


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
