"""Direct H -> iMPS for a dimerized chain via the correlation-matrix route,
validated by the reconstruction overlap (mirrors reference
examples/iMPS_slater.py)."""

import numpy as np

from temfpy_tpu import slater
from temfpy_tpu.mps import MPS


def H(L, t1=-1, t2=-1.5):
    M = t1 * np.ones(L - 1)
    M[1::2] = t2
    M = np.diag(M, 1)
    return M + M.T


trunc_par = dict(chi_max=100)
L_short = 128
cell = 2
cut = L_short // 2

imps, val_metric = slater.H_to_iMPS(H(L_short), H(L_short + cell), trunc_par, cell, cut, offset=0)
print("Error metric:", val_metric)

n_cell = 8
mps_short = slater.H_to_MPS(H(L_short), trunc_par)
mps_vlong = slater.H_to_MPS(H(L_short + n_cell * cell), trunc_par)
s = mps_short.sites[:cut] + imps.sites * n_cell + mps_short.sites[cut:]
B = list(mps_short._B[:cut]) + list(imps._B) * n_cell + list(mps_short._B[cut:])
S = (
    list(mps_short._S[:cut])
    + [imps._S[j] for j in range(cell)] * n_cell
    + list(mps_short._S[cut:])
)
f = mps_short.form[:cut] + ["B"] * (cell * n_cell) + mps_short.form[cut:]
mps_rec = MPS(s, B, S, form=f, bc="finite")
print("Reconstruction overlap:", mps_vlong.overlap(mps_rec))
