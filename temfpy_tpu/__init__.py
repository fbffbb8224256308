"""TeMFpy-TPU: a TPU-native library for converting fermionic mean-field states
into matrix product states.

This is a from-scratch JAX/XLA rebuild of the capabilities of TeMFpy
(reference: temfpy/temfpy): Slater determinants and Pfaffian/BdG states are
compressed into finite and infinite MPS, with optional Gutzwiller projection
to spin-1/2 wavefunctions.  Unlike the reference, which is layered on TeNPy's
block-sparse tensor engine and the pfapack C Pfaffian routine, everything here
is built TPU-first:

- correlation-matrix eigendecompositions for *all* entanglement cuts are
  batched into single padded ``eigh`` calls on device,
- Slater-determinant overlaps (determinants) and Bogoliubov-state overlaps
  (Pfaffians) are evaluated as giant static-shape batches,
- the MPS engine uses dense, padded, charge-labelled tensors instead of
  block-sparse bookkeeping, so every operation is ``jit``/``vmap``/``pjit``
  compatible,
- large systems shard the cut-batch and bond dimension across a
  ``jax.sharding.Mesh`` with ICI collectives.

Public module surface mirrors the reference package (``temfpy.__init__``):
``slater``, ``pfaffian``, ``gutzwiller``, ``iMPS``, ``schmidt_utils``,
``utils``, ``testing``; plus TPU-native extras ``ops``, ``mps``, ``parallel``.
"""

import logging as _logging

__version__ = "0.1.0"

__all__ = [
    "slater",
    "pfaffian",
    "gutzwiller",
    "iMPS",
    "schmidt_utils",
    "utils",
    "testing",
    "ops",
    "mps",
    "parallel",
    "config",
]

_lazy_modules = {name: f"temfpy_tpu.{name}" for name in __all__}


def setup_logging(level=_logging.INFO):
    """Basic logging config, mirroring the reference ``temfpy.setup_logging``."""
    _logging.basicConfig(level=level)


def __getattr__(name):
    """Lazy-load submodules on first access (keeps `import temfpy_tpu` fast and
    avoids pulling in JAX before the user had a chance to set flags)."""
    if name in _lazy_modules:
        import importlib

        module = importlib.import_module(_lazy_modules[name])
        globals()[name] = module
        return module
    raise AttributeError(f"module '{__name__}' has no attribute '{name}'")
