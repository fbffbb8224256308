"""Convert a disordered hopping chain's ground state to a finite MPS.

Physics check (same contract as reference examples/slater.py, code is this
library's own): every two-point function <c^dag_i c_j> of the MPS must
reproduce the input correlation matrix to truncation accuracy.

Run:  python examples/slater.py [L] [chi]
"""

import logging
import sys

import numpy as np

from temfpy_tpu import setup_logging, slater
from temfpy_tpu.schmidt_utils import StoppingCondition


def dimerized_chain(L, *, t=1.0, delta=0.25, disorder=0.05, seed=7):
    """Gapped dimerized chain with weak on-site disorder (breaks all
    accidental degeneracies, so the Schmidt spectra are generic)."""
    rng = np.random.default_rng(seed)
    hop = -t * (1.0 + delta * (-1.0) ** np.arange(L - 1))
    H = np.diag(hop, 1)
    H += H.T
    H += np.diag(disorder * rng.standard_normal(L))
    return H


def main(L=48, chi=160):
    setup_logging(logging.INFO)
    H = dimerized_chain(L)

    # an explicit StoppingCondition instead of a bare dict: keep at most
    # chi states per bond, drop Schmidt values below svd_min, never split
    # a degenerate multiplet.  (svd_min below ~1e-7 puts the eigenvalue
    # cutoff svd_min^2 under the dense-eigensolver noise floor — keep it
    # at or above the 1e-6 default.)
    trunc = StoppingCondition(chi_max=chi, svd_min=1e-6)
    mps = slater.H_to_MPS(H, trunc)

    C = np.asarray(slater.correlation_matrix(H)[0])
    C_mps = mps.correlation_function("Cd", "C").T
    print(f"chi profile: max {mps.chi_max}, "
          f"center {mps.chi(L // 2)}")
    print(f"max |<Cd C>_mps - C| = {np.abs(C_mps - C).max():.3e}")
    print(f"entanglement entropy at center bond: "
          f"{mps.entanglement_entropy()[L // 2 - 1]:.6f}")
    return mps


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
