"""Run the reference library's algorithmic core as a parity oracle.

The real reference (/root/reference, temfpy/temfpy) depends on TeNPy and
pfapack, neither of which is installable in this container.  But its
*algorithmic* core — ``SchmidtModes`` / ``SchmidtVectors`` for both state
classes, ``lowest_sums``/``StoppingCondition``, ``block_svd``, and the
Slater/Pfaffian overlap machinery up to the npc tensor assembly — is pure
numpy/scipy: TeNPy is touched only at module import time (site
prototypes) and inside ``to_npc_array``/MPS construction, and pfapack
only inside ``_many_pfaffian``.

This module loads the reference package with

- a minimal ``tenpy`` stub satisfying the import-time surface
  (``networks.site.FermionSite().leg.chinfo`` and attribute existence for
  the npc symbols), and
- a ``pfapack.ctypes.pfaffian`` stub backed by this repo's independent
  C++ Pfaffian (``native/pfaffian.cpp``; pure-numpy fallback inside
  ``temfpy_tpu.ops.native``), which is itself cross-validated against
  the JAX kernels in tests/test_native.py.

so parity tests can compare Schmidt spectra, subset enumeration, and
overlap values against the genuine reference code at sizes far beyond
exact diagonalization (SURVEY.md §4 oracle (a), VERDICT round-3 item 8).

Nothing here executes reference code paths that need real TeNPy; those
(tensor assembly, canonical forms, Gutzwiller) are covered by the ED
oracles and internal contracts instead.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

_REF_SRC = Path("/root/reference/src")


def reference_available() -> bool:
    return (_REF_SRC / "temfpy" / "slater.py").exists()


def _make_tenpy_stub() -> dict:
    """sys.modules entries for the import-time tenpy surface."""

    class _ChInfo:
        def __init__(self, qmod=(1,)):
            self.mod = np.asarray(qmod)

        def __eq__(self, other):
            return isinstance(other, _ChInfo) and np.array_equal(
                self.mod, other.mod
            )

    class _Leg:
        def __init__(self, chinfo):
            self.chinfo = chinfo

    class _FermionSite:
        def __init__(self, conserve="N", filling=0.5):
            self.conserve = conserve
            self.leg = _Leg(_ChInfo((1,) if conserve == "N" else (2,)))

    class _SpinHalfSite:
        def __init__(self, conserve="Sz", **kw):
            self.conserve = conserve
            self.leg = _Leg(_ChInfo((1,)))

    def _unavailable(name):
        def fn(*a, **k):
            raise NotImplementedError(
                f"tenpy stub: {name} is not available in the parity oracle"
            )

        return fn

    tenpy = types.ModuleType("tenpy")
    linalg = types.ModuleType("tenpy.linalg")
    npc = types.ModuleType("tenpy.linalg.np_conserved")
    networks = types.ModuleType("tenpy.networks")
    site_mod = types.ModuleType("tenpy.networks.site")
    mps_mod = types.ModuleType("tenpy.networks.mps")

    for name in (
        "Array",
        "zeros",
        "tensordot",
        "svd",
        "inner",
        "norm",
        "LegPipe",
        "ChargeInfo",
    ):
        setattr(npc, name, _unavailable(f"npc.{name}"))

    class _LegCharge:
        from_qdict = staticmethod(_unavailable("npc.LegCharge.from_qdict"))

    npc.LegCharge = _LegCharge
    npc.ChargeInfo = _ChInfo

    site_mod.FermionSite = _FermionSite
    site_mod.SpinHalfSite = _SpinHalfSite
    mps_mod.MPS = _unavailable("networks.mps.MPS")
    mps_mod.TransferMatrix = _unavailable("networks.mps.TransferMatrix")
    networks.site = site_mod
    networks.mps = mps_mod
    networks.MPS = mps_mod.MPS
    networks.FermionSite = _FermionSite
    networks.SpinHalfSite = _SpinHalfSite
    tenpy.linalg = linalg
    tenpy.networks = networks
    linalg.np_conserved = npc

    return {
        "tenpy": tenpy,
        "tenpy.linalg": linalg,
        "tenpy.linalg.np_conserved": npc,
        "tenpy.networks": networks,
        "tenpy.networks.site": site_mod,
        "tenpy.networks.mps": mps_mod,
    }


def _make_pfapack_stub() -> dict:
    from temfpy_tpu.ops.native import pfaffian_batch

    def pfaffian(A, uplo="L", method="P", avoid_overflow=False):
        A = np.asarray(A)
        return complex(pfaffian_batch(A[None])[0])

    pfapack = types.ModuleType("pfapack")
    ctypes_mod = types.ModuleType("pfapack.ctypes")
    ctypes_mod.pfaffian = pfaffian
    pfapack.ctypes = ctypes_mod
    return {"pfapack": pfapack, "pfapack.ctypes": ctypes_mod}


_loaded = None


def load_reference():
    """Import and return the reference ``temfpy`` package (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not reference_available():
        raise RuntimeError("reference source not present")
    stubs = {}
    stubs.update(_make_tenpy_stub())
    stubs.update(_make_pfapack_stub())
    ver = types.ModuleType("temfpy._version")
    ver.__version__ = "0.0-oracle"
    stubs["temfpy._version"] = ver
    for name, mod in stubs.items():
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, str(_REF_SRC))
    try:
        import temfpy  # noqa: F401
        import temfpy.slater
        import temfpy.pfaffian
        import temfpy.schmidt_utils
        import temfpy.utils
        import temfpy.testing
    finally:
        sys.path.remove(str(_REF_SRC))
    _loaded = sys.modules["temfpy"]
    return _loaded
