"""Mesh-sharded conversion tests on the virtual 8-device CPU mesh.

Covers parallel/mesh.py end-to-end in pytest (previously only the driver's
dryrun exercised it): the production C_to_MPS under ``use_mesh`` must be
numerically identical to the single-device conversion, and the standalone
sharded kernels must match their dense counterparts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temfpy_tpu import slater
from temfpy_tpu.parallel import mesh as pmesh


needs_multi = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the virtual multi-device mesh"
)


def _gapped_C(L, seed=3):
    H = np.zeros((L, L))
    for i in range(L - 1):
        H[i, i + 1] = H[i + 1, i] = -1.0 - 0.3 * (-1) ** i
    rng = np.random.default_rng(seed)
    H += np.diag(0.05 * rng.standard_normal(L))
    e, v = np.linalg.eigh(H)
    occ = v[:, e < 0]
    return occ @ occ.T


@needs_multi
def test_use_mesh_conversion_bit_identical():
    """C_to_MPS under use_mesh == single-device C_to_MPS, tensor by tensor."""
    C = _gapped_C(16)
    ref = slater.C_to_MPS(C, {"chi_max": 16})
    with pmesh.use_mesh(pmesh.make_mesh()):
        out = slater.C_to_MPS(C, {"chi_max": 16})
    assert ref.L == out.L
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        assert dev == 0.0, f"site {i} deviates by {dev}"
    for sa, sb in zip(ref._S, out._S):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


@needs_multi
def test_sharded_schmidt_spectra_matches_dense():
    C = _gapped_C(12)
    mesh = pmesh.make_mesh()
    sizes = np.arange(1, 12, dtype=np.int32)
    e_s, v_s = pmesh.sharded_schmidt_spectra(jnp.asarray(C), sizes, "L", mesh)
    for i, x in enumerate(sizes):
        ee = np.linalg.eigvalsh(C[:x, :x])
        np.testing.assert_allclose(np.asarray(e_s)[i, :x], ee, atol=1e-12)


@needs_multi
def test_sharded_det_pairs_matches_dense():
    rng = np.random.default_rng(0)
    M = rng.standard_normal((10, 10))
    w = 4
    rows = rng.integers(0, 10, size=(24, w)).astype(np.int32)
    cols = rng.integers(0, 10, size=(24, w)).astype(np.int32)
    mesh = pmesh.make_mesh()
    out = pmesh.sharded_det_pairs(jnp.asarray(M), rows, cols, mesh)
    expect = [np.linalg.det(M[np.ix_(r, c)]) for r, c in zip(rows, cols)]
    # atol: duplicate random indices give exact-zero reference determinants
    # that the LU kernel reproduces only to round-off
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-10, atol=1e-10)


@needs_multi
def test_shard_batch_and_replicate_roundtrip():
    mesh = pmesh.make_mesh()
    x = np.arange(32.0).reshape(16, 2)
    with pmesh.use_mesh(mesh):
        xs = pmesh.shard_batch(x)
        xr = pmesh.replicate(x)
    np.testing.assert_array_equal(np.asarray(xs), x)
    np.testing.assert_array_equal(np.asarray(xr), x)
    # sharded along the leading axis over the "pairs" mesh axis
    assert xs.sharding.spec[0] == "pairs"
    assert xr.sharding.spec == tuple()
    # each device holds 1/n_pairs of the rows
    shard_rows = {s.data.shape[0] for s in xs.addressable_shards}
    assert shard_rows == {16 // mesh.shape["pairs"]}


@needs_multi
def test_multichip_conversion_step_runs():
    """The driver dryrun body, in pytest."""
    out = pmesh.multichip_conversion_step(pmesh.make_mesh(), L=12, width=4)
    assert np.isfinite(out)


@needs_multi
def test_chi_sharded_fill_bit_identical(monkeypatch):
    """With CHI_SHARD_MIN lowered to test scale, the fused fill's scatter
    targets are sharded along the bond axis over the mesh "cuts" axis
    (BASELINE config 5: chi >= 4096 tensors must not replicate per chip);
    the conversion stays bit-identical to single-device."""
    from temfpy_tpu import config

    # near-critical chain: bond buckets reach >= 32
    L = 24
    H = np.zeros((L, L))
    for i in range(L - 1):
        H[i, i + 1] = H[i + 1, i] = -1.0
    e, v = np.linalg.eigh(H)
    occ = v[:, e < 0]
    C = occ @ occ.T

    monkeypatch.setenv("TEMFPY_TPU_DET_UPDATES", "0")  # all pairs direct
    ref = slater.C_to_MPS(C, {"chi_max": 64})
    monkeypatch.setattr(config, "CHI_SHARD_MIN", 32)
    sharded_calls = []
    orig = slater._sharded_packed_fill
    monkeypatch.setattr(
        slater, "_sharded_packed_fill",
        lambda mesh, ndim: (sharded_calls.append(ndim), orig(mesh, ndim))[1],
    )
    with pmesh.use_mesh(pmesh.make_mesh()):
        out = slater.C_to_MPS(C, {"chi_max": 64})
    assert sharded_calls, (
        "no fill bucket took the chi-sharded path; lower the test threshold")
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        assert dev == 0.0, f"site {i} deviates by {dev}"
    for sa, sb in zip(ref._S, out._S):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


@needs_multi
def test_mesh_pfaffian_split_bit_identical(monkeypatch):
    """Split-plane Pfaffian conversion under use_mesh (pairs-sharded packed
    Pfaffian batches) is bit-identical to single-device."""
    from temfpy_tpu import pfaffian, testing as tst

    monkeypatch.setenv("TEMFPY_TPU_DEVICE_COMPLEX", "0")
    monkeypatch.setattr(tst, "TEST_ACTION", "pass")
    L = 6
    H = np.zeros((2 * L, 2 * L), complex)
    for i in range(L - 1):  # Kitaev chain in C basis
        H[i, i + 1] = H[i + 1, i] = -1.0
        H[i, L + i + 1] = 0.8
        H[i + 1, L + i] = -0.8
        H[L + i + 1, i] = 0.8
        H[L + i, i + 1] = -0.8
    for i in range(L):
        H[i, i] = -0.5
    H[L:, L:] = -H[:L, :L].conj()
    ref = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="C")
    with pmesh.use_mesh(pmesh.make_mesh()):
        out = pfaffian.H_to_MPS(H, {"chi_max": 64}, basis="C")
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        assert dev == 0.0, f"site {i} deviates by {dev}"


@needs_multi
def test_gutzwiller_flow_under_mesh_bit_identical():
    """The full spinful conversion + Gutzwiller projection runs inside
    use_mesh and matches the single-device flow exactly (VERDICT r3:
    the aux flows had never executed under a mesh)."""
    from temfpy_tpu import gutzwiller

    L = 8
    H = np.zeros((L, L))
    for i in range(L - 1):
        H[i, i + 1] = H[i + 1, i] = -1.0
    ref_mps = slater.H_to_MPS(H, {"chi_max": 32}, spinful="PH")
    ref = gutzwiller.abrikosov_ph(ref_mps)
    with pmesh.use_mesh(pmesh.make_mesh()):
        out_mps = slater.H_to_MPS(H, {"chi_max": 32}, spinful="PH")
        out = gutzwiller.abrikosov_ph(out_mps)
    assert ref.L == out.L
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        assert dev == 0.0, f"projected site {i} deviates by {dev}"
    np.testing.assert_array_equal(
        np.asarray(ref.expectation_value("Sz")),
        np.asarray(out.expectation_value("Sz")),
    )


@needs_multi
def test_imps_flow_under_mesh_bit_identical():
    """H_to_iMPS (conversion + gauge matching) inside use_mesh matches the
    single-device result exactly."""

    def dimer_H(L, t1=-1.0, t2=-0.4):
        H = np.zeros((L, L))
        for i in range(L - 1):
            H[i, i + 1] = H[i + 1, i] = t1 if i % 2 == 0 else t2
        return H

    ref, ref_err = slater.H_to_iMPS(
        dimer_H(16), dimer_H(18), dict(chi_max=24), 2, 8
    )
    with pmesh.use_mesh(pmesh.make_mesh()):
        out, out_err = slater.H_to_iMPS(
            dimer_H(16), dimer_H(18), dict(chi_max=24), 2, 8
        )
    assert ref_err.total_error == out_err.total_error
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        assert dev == 0.0, f"iMPS site {i} deviates by {dev}"


def _shard_stats(tensors):
    """(#sharded tensors, per-device resident bytes) of a tensor list."""
    n_sharded = 0
    per_dev: dict = {}
    for t in tensors:
        if isinstance(t, np.ndarray):
            continue
        sh = t.sharding.shard_shape(t.shape)
        if sh != t.shape:
            n_sharded += 1
        nbytes = int(np.prod(sh)) * t.dtype.itemsize
        for d in t.sharding.device_set:
            per_dev[d.id] = per_dev.get(d.id, 0) + nbytes
    return n_sharded, per_dev


@needs_multi
@pytest.mark.slow
def test_mesh_resident_canonical_sweep(monkeypatch):
    """canonical_form_finite under use_mesh keeps every produced tensor's
    bond axis sharded over the mesh (the north-star residency requirement,
    VERDICT r4 #1) and stays bit-identical to the unsharded device sweep."""
    import functools

    from temfpy_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(
        mesh_mod, "bond_shard_put",
        functools.partial(mesh_mod.bond_shard_put, min_dim=8),
    )
    C = _gapped_C(24, seed=5)
    ref = slater.C_to_MPS(C, {"chi_max": 32})
    out = ref.copy()
    ref.canonical_form_finite()
    with pmesh.use_mesh(pmesh.make_mesh()):
        out.canonical_form_finite()
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        assert dev == 0.0, f"swept site {i} deviates by {dev}"
    for sa, sb in zip(ref._S, out._S):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    n_sharded, per_dev = _shard_stats(out._B)
    assert n_sharded >= 2, f"sweep kept only {n_sharded} tensors sharded"
    assert len(per_dev) == len(jax.devices())
    bal = max(per_dev.values()) / max(min(per_dev.values()), 1)
    assert bal < 1.6, f"per-device sweep residency imbalance: {per_dev}"


@needs_multi
@pytest.mark.slow
def test_mesh_resident_gutzwiller(monkeypatch):
    """abrikosov_ph under use_mesh leaves the projected + re-canonicalised
    chain bond-sharded (mesh-resident Gutzwiller, VERDICT r4 #1)."""
    import functools

    from temfpy_tpu import gutzwiller
    from temfpy_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(
        mesh_mod, "bond_shard_put",
        functools.partial(mesh_mod.bond_shard_put, min_dim=8),
    )
    L = 12
    H = np.zeros((L, L))
    for i in range(L - 1):
        H[i, i + 1] = H[i + 1, i] = -1.0 - 0.2 * (-1) ** i
    ref = gutzwiller.abrikosov_ph(slater.H_to_MPS(H, {"chi_max": 48}, spinful="PH"))
    with pmesh.use_mesh(pmesh.make_mesh()):
        out = gutzwiller.abrikosov_ph(
            slater.H_to_MPS(H, {"chi_max": 48}, spinful="PH")
        )
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        # the grouped-pair contraction over a sharded bond axis reorders
        # the partial-sum reduction; the 1-ulp input deviation is then
        # amplified by the re-canonicalisation SVDs (4e-13 observed)
        assert dev < 1e-10, f"projected site {i} deviates by {dev}"
    n_sharded, _ = _shard_stats(out._B)
    assert n_sharded >= 1, "projection dropped every tensor to replicated"
