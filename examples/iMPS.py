"""Finite -> infinite MPS for a dimerized chain, validated by splicing extra
unit cells into the finite MPS and checking the overlap (mirrors reference
examples/iMPS.py)."""

import numpy as np

from temfpy_tpu import iMPS, slater
from temfpy_tpu.mps import MPS


def H(L, t1=-1, t2=-1.5):
    M = t1 * np.ones(L - 1)
    M[1::2] = t2
    M = np.diag(M, 1)
    return M + M.T


trunc_par = dict(chi_max=100)

L_short = 128
cut = L_short // 2

mps_short = slater.H_to_MPS(H(L_short), trunc_par)
mps_long = slater.H_to_MPS(H(L_short + 2), trunc_par)

imps, val_metric = iMPS.MPS_to_iMPS(mps_short, mps_long, 2, cut, offset=0)
print("Error metric:", val_metric)

# check overlap after inserting more unit cells
n_cell = 8
mps_vlong = slater.H_to_MPS(H(L_short + n_cell * 2), trunc_par)
s_vlong = mps_short.sites[:cut] + imps.sites * n_cell + mps_short.sites[cut:]
B_vlong = list(mps_short._B[:cut]) + list(imps._B) * n_cell + list(mps_short._B[cut:])
S_vlong = (
    list(mps_short._S[:cut])
    + [imps._S[j] for j in range(imps.L)] * n_cell
    + list(mps_short._S[cut:])
)
f_vlong = mps_short.form[:cut] + ["B"] * (imps.L * n_cell) + mps_short.form[cut:]
mps_rec = MPS(s_vlong, B_vlong, S_vlong, form=f_vlong, bc="finite")
print("Reconstruction overlap:", mps_vlong.overlap(mps_rec))
