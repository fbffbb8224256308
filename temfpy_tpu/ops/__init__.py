"""Device kernels: padded batched eigh, batched determinants, batched
Pfaffians, and degenerate-block SVD completion.

All kernels follow the static-shape discipline required by XLA on TPU:
variable-size problems are embedded into fixed-size ones using exact padding
identities (identity blocks for determinants, symplectic J blocks for
Pfaffians, shifted diagonal blocks for eigendecompositions), so a single
compiled executable serves every cut/site/charge-block.
"""

from . import linalg, pfaffian  # noqa: F401
from .linalg import (  # noqa: F401
    block_svd,
    eigh_blocks,
    batched_det_gather,
    batched_det_pairs,
    block_diag_identity_pad,
)
from .pfaffian import (  # noqa: F401
    batched_pfaffian,
    batched_pfaffian_gather,
    batched_pfaffian_pairs,
)
