"""MPS checkpointing: save/load to a single .npz archive.

The reference has no checkpoint story (SURVEY.md section 5.4: TeNPy MPS are
hdf5-serializable upstream but temfpy never calls save/load); here the full
MPS pytree (tensors, Schmidt values, charge labels, forms, geometry) round-
trips through one portable file.
"""

from __future__ import annotations

import json

import numpy as np

from .charges import ChargeInfo
from .mps import MPS
from .site import FermionSite, SpinHalfSite, Site


def _site_tag(site: Site) -> str:
    if isinstance(site, FermionSite):
        return f"fermion:{site.conserve}"
    if isinstance(site, SpinHalfSite):
        return f"spinhalf:{site.conserve or 'none'}"
    raise TypeError(f"cannot serialise site {site!r}")


def _site_from_tag(tag: str) -> Site:
    kind, conserve = tag.split(":")
    if kind == "fermion":
        return FermionSite(conserve=conserve)
    if kind == "spinhalf":
        return SpinHalfSite(None if conserve == "none" else conserve)
    raise ValueError(f"unknown site tag {tag!r}")


def save_mps(path: str, mps: MPS) -> None:
    """Saves an MPS to ``path`` (.npz)."""
    meta = {
        "bc": mps.bc,
        "unit_cell_width": mps.unit_cell_width,
        "form": [f if f is not None else "" for f in mps.form],
        "sites": [_site_tag(s) for s in mps.sites],
        "norm": mps.norm,
        "chinfo_mod": mps.chinfo.mod,
        "chinfo_name": mps.chinfo.name,
    }
    arrays = {"__meta__": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)}
    for i, B in enumerate(mps._B):
        arrays[f"B{i}"] = np.asarray(B)
    for i, S in enumerate(mps._S):
        arrays[f"S{i}"] = np.asarray(S) if S is not None else np.zeros(0)
    for i, q in enumerate(mps.q_bond):
        arrays[f"q{i}"] = np.asarray(q)
    arrays["qtotal"] = np.asarray(mps.qtotal)
    np.savez_compressed(path, **arrays)


def load_mps(path: str) -> MPS:
    """Loads an MPS saved by :func:`save_mps`."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    L = len(meta["sites"])
    sites = [_site_from_tag(t) for t in meta["sites"]]
    Bs = [data[f"B{i}"] for i in range(L)]
    SVs = [
        (data[f"S{i}"] if data[f"S{i}"].size else None) for i in range(L + 1)
    ]
    q_bonds = [data[f"q{i}"] for i in range(L + 1)]
    form = [f if f else None for f in meta["form"]]
    mps = MPS(
        sites,
        Bs,
        SVs,
        form=form,
        bc=meta["bc"],
        unit_cell_width=meta["unit_cell_width"],
        q_bonds=q_bonds,
        qtotals=data["qtotal"],
        norm=meta["norm"],
    )
    mps.chinfo = ChargeInfo(mod=meta["chinfo_mod"], name=meta["chinfo_name"])
    return mps
