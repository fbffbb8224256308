"""From-scratch charge-aware MPS engine (replaces the TeNPy surface used by
the reference — np_conserved Arrays, LegCharge/LegPipe, networks.MPS,
TransferMatrix, FermionSite/SpinHalfSite).

Design (TPU-first, cf. SURVEY.md section 7): tensors are *dense* device
arrays of shape (chiL, d, chiR); each bond carries a host-side integer charge
label per index (`q_bond`), and charge conservation is a property of the data
(entries that violate it are exactly zero) rather than of a block-sparse
container.  This keeps every contraction, QR and SVD a single static-shape
XLA op; charge labels only steer *which* rows/columns are grouped together
for charge-resolved factorizations and for Gutzwiller masking.
"""

from .charges import ChargeInfo  # noqa: F401
from .site import FermionSite, SpinHalfSite, Site  # noqa: F401
from .mps import MPS  # noqa: F401
from .charged_linalg import charged_svd, charged_qr  # noqa: F401
from .io import save_mps, load_mps  # noqa: F401
