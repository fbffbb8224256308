"""Multi-chip sharding for large-L / large-chi conversions.

The reference is a single-process CPU library with no parallelism beyond BLAS
threads (SURVEY.md section 2.3); these are the TPU-native scaling axes it
never exploits:

- the per-cut block eigendecompositions are independent given C -> shard the
  cut batch across the mesh ("cuts" axis, data-parallel),
- the per-site overlap-determinant batch is an embarrassingly parallel list
  of small determinants -> shard the pair batch ("pairs" axis),
- reductions (Schmidt-value norms, entropies) ride ICI collectives inserted
  by GSPMD from the sharding annotations.
"""

from .mesh import (  # noqa: F401
    make_mesh,
    flagship_forward,
    sharded_schmidt_spectra,
    sharded_det_pairs,
    multichip_conversion_step,
)
