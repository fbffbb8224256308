"""Device meshes and sharded kernels (jax.sharding + GSPMD collectives)."""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import complex_dtype  # noqa: F401  (x64 side effect)
from ..ops.linalg import _eigh_blocks_impl, block_diag_identity_pad, lu_det


def make_mesh(n_devices: int | None = None, axes=("cuts", "pairs")) -> Mesh:
    """A 2D device mesh over the first ``n_devices`` devices.

    The "cuts" axis parallelises independent entanglement cuts (data
    parallel); the "pairs" axis parallelises the determinant/Pfaffian batch
    of the tensor fill (the analogue of tensor parallelism: it splits one
    site's work).
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    # factor n into a near-square 2D grid
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    grid = np.asarray(devices).reshape(a, n // a)
    return Mesh(grid, axes)


# ----------------------------------------------------------------------
# flagship single-chip forward step (used by __graft_entry__.entry)
# ----------------------------------------------------------------------


@jax.jit
def flagship_forward(C):
    """One fused device step of the Slater->MPS frontend: eigendecompose the
    left blocks of C for ALL cuts (padded batch) and reduce to per-cut
    entanglement data.

    Returns (eigenvalues (L+1, L), entropies (L+1,)).
    """
    L = C.shape[-1]
    sizes = jnp.arange(L + 1, dtype=jnp.int32)
    e, _v = _eigh_blocks_impl(C, sizes, "L")
    lam = jnp.clip(e, 1e-300, 1.0)
    valid = e < 1.5  # mask out padding eigenvalues (2.0)
    ent = -(lam * jnp.log(lam) + (1 - lam) * jnp.log1p(-lam))
    ent = jnp.where(valid & (e > 1e-12) & (e < 1 - 1e-12), ent, 0.0)
    return e, ent.sum(axis=-1)


# ----------------------------------------------------------------------
# sharded kernels
# ----------------------------------------------------------------------


def sharded_schmidt_spectra(C, sizes, side: str, mesh: Mesh, axis: str = "cuts"):
    """Batched block eigendecomposition with the cut batch sharded over a
    mesh axis; C is replicated (it is small compared to the eigenvector
    batch).  The batch length must be divisible by the axis size."""
    C = jnp.asarray(C)
    sizes = jnp.asarray(sizes, jnp.int32)
    n_ax = mesh.shape[axis]
    pad = (-len(sizes)) % n_ax
    if pad:
        sizes = jnp.concatenate([sizes, jnp.ones((pad,), jnp.int32)])
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    fn = jax.jit(
        partial(_eigh_blocks_impl, side=side),
        in_shardings=(rep, shard),
        out_shardings=(shard, shard),
    )
    e, v = fn(jax.device_put(C, rep), jax.device_put(sizes, shard))
    if pad:
        e, v = e[:-pad], v[:-pad]
    return e, v


@jax.jit
def _det_pairs_sharded_impl(M_aug, rows, cols):
    sub = M_aug[rows[:, :, None], cols[:, None, :]]
    return lu_det(sub)


def sharded_det_pairs(M, row_idx, col_idx, mesh: Mesh, axis: str = "pairs"):
    """Pair-batched determinants with the pair axis sharded over the mesh."""
    M = jnp.asarray(M)
    row_idx = jnp.asarray(row_idx, jnp.int32)
    col_idx = jnp.asarray(col_idx, jnp.int32)
    k = row_idx.shape[1]
    M_aug = block_diag_identity_pad(M, k)
    n_ax = mesh.shape[axis]
    P_n = row_idx.shape[0]
    pad = (-P_n) % n_ax
    if pad:
        sentinel = M.shape[0] + jnp.arange(k, dtype=jnp.int32)
        extra = jnp.broadcast_to(sentinel, (pad, k))
        row_idx = jnp.concatenate([row_idx, extra])
        col_idx = jnp.concatenate([col_idx, extra])
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    fn = jax.jit(
        _det_pairs_sharded_impl,
        in_shardings=(rep, shard, shard),
        out_shardings=shard,
    )
    out = fn(jax.device_put(M_aug, rep), jax.device_put(row_idx, shard),
             jax.device_put(col_idx, shard))
    return out[:P_n] if pad else out


# ----------------------------------------------------------------------
# multi-chip dry-run "training step"
# ----------------------------------------------------------------------


def multichip_conversion_step(mesh: Mesh, L: int = 16, width: int = 4, n_pairs: int = 64):
    """The multi-chip dry run: executes the ACTUAL production conversion
    (slater.C_to_MPS) with its batched kernels sharded over the mesh via
    :class:`use_mesh` — the all-cuts eigendecompositions over the "cuts"
    axis, the determinant pair batches over the "pairs" axis, GSPMD
    inserting the collectives — and checks the result is numerically
    identical to the single-device conversion.  Also runs the synthetic
    sharded step (eigh slab + det batch + cross-axis reduction).

    Returns a finite scalar (checked by the caller).
    """
    from .. import slater
    from ..mps import MPS  # noqa: F401  (import check)

    rng0 = np.random.default_rng(7)
    h0 = rng0.normal(size=(L, L))
    h0 = h0 + h0.T
    _e0, v0 = np.linalg.eigh(h0)
    C0 = (v0[:, : L // 2] @ v0[:, : L // 2].T).astype(np.float64)

    mps_ref = slater.C_to_MPS(C0, {"chi_max": 16})
    with use_mesh(mesh):
        mps_mesh = slater.C_to_MPS(C0, {"chi_max": 16})
    for a, b in zip(mps_ref._B, mps_mesh._B):
        dev = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        assert dev < 1e-12, f"mesh-sharded conversion deviates: {dev}"
    # chi-sharded fill: scatter targets' bond axis sharded over "cuts"
    # (config-5 path, normally gated to chi >= config.CHI_SHARD_MIN)
    from .. import config as _config

    prev_min = _config.CHI_SHARD_MIN
    _config.CHI_SHARD_MIN = 8
    try:
        with use_mesh(mesh):
            mps_chi = slater.C_to_MPS(C0, {"chi_max": 16})
    finally:
        _config.CHI_SHARD_MIN = prev_min
    for a, b in zip(mps_ref._B, mps_chi._B):
        dev = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        assert dev < 1e-12, f"chi-sharded conversion deviates: {dev}"
    # tensors already bit-compare; the overlap just confirms contractability
    fid = abs(mps_ref.overlap(mps_mesh)) / max(mps_ref.norm_squared(), 1e-30)
    assert np.isfinite(fid) and fid > 1 - 1e-10

    # ---- MESH-RESIDENT conversion: a load-bearing shape where the bond
    # axis of the produced tensors stays sharded over an all-devices "cuts"
    # axis (the chi >= 1024 residency wall, BASELINE.md round 4: replicated
    # output is N_devices x 68 GB at the north-star shape).  Asserts the
    # tensors ARE sharded, the per-device bytes balance, and the state
    # matches the single-device conversion. ----
    n_dev = int(np.prod(list(mesh.shape.values())))
    rmesh = Mesh(
        np.asarray(mesh.devices).reshape(n_dev, 1), ("cuts", "pairs")
    )
    Lr = 48
    rng2 = np.random.default_rng(11)
    h2 = rng2.normal(size=(Lr, Lr))
    h2 = h2 + h2.T
    _e2, v2 = np.linalg.eigh(h2)
    C2 = (v2[:, : Lr // 2] @ v2[:, : Lr // 2].T).astype(np.float64)
    mps_r0 = slater.C_to_MPS(C2, {"chi_max": 48})
    prev_min2 = _config.CHI_SHARD_MIN
    _config.CHI_SHARD_MIN = 64  # bucketed bond = 64 -> gate fires
    try:
        with use_mesh(rmesh):
            mps_res = slater.C_to_MPS(C2, {"chi_max": 48})
    finally:
        _config.CHI_SHARD_MIN = prev_min2
    n_sharded = 0
    per_dev: dict = {}
    for t in mps_res._B:
        sh = t.sharding.shard_shape(t.shape)
        if sh != t.shape:
            n_sharded += 1
        for d in t.sharding.device_set:
            per_dev[d.id] = per_dev.get(d.id, 0) + (
                int(np.prod(t.sharding.shard_shape(t.shape)))
                * t.dtype.itemsize
            )
    assert n_sharded >= Lr // 2, (
        f"mesh-resident conversion produced only {n_sharded} sharded "
        f"tensors of {Lr}"
    )
    bal = max(per_dev.values()) / max(min(per_dev.values()), 1)
    assert bal < 1.01, f"per-device residency imbalance {per_dev}"
    for a, b in zip(mps_r0._B, mps_res._B):
        dev = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        assert dev < 1e-12, f"mesh-resident conversion deviates: {dev}"

    rng = np.random.default_rng(0)
    h = rng.normal(size=(L, L))
    h = h + h.T
    e, v = np.linalg.eigh(h)
    C = (v[:, : L // 2] @ v[:, : L // 2].T).astype(np.float64)

    n_cuts = mesh.shape["cuts"] * max(1, (L + 1) // mesh.shape["cuts"])
    sizes = (np.arange(n_cuts) % L + 1).astype(np.int32)

    rep = NamedSharding(mesh, P())
    shard_c = NamedSharding(mesh, P("cuts"))
    shard_p = NamedSharding(mesh, P("pairs"))

    M = rng.normal(size=(8, 8))
    M_aug = np.zeros((8 + width, 8 + width))
    M_aug[:8, :8] = M
    M_aug[8:, 8:] = np.eye(width)
    n_pairs = mesh.shape["pairs"] * max(1, n_pairs // mesh.shape["pairs"])
    rows = rng.integers(0, 8, size=(n_pairs, width)).astype(np.int32)
    cols = rng.integers(0, 8, size=(n_pairs, width)).astype(np.int32)

    @partial(
        jax.jit,
        in_shardings=(rep, shard_c, rep, shard_p, shard_p),
        out_shardings=NamedSharding(mesh, P()),
    )
    def step(C, sizes, M_aug, rows, cols):
        e, _v = _eigh_blocks_impl(C, sizes, "L")
        lam = jnp.clip(e, 1e-30, 1.0)
        ent = jnp.where(e < 1.5, -lam * jnp.log(lam), 0.0).sum()
        sub = M_aug[rows[:, :, None], cols[:, None, :]]
        dets = lu_det(sub)
        # cross-axis reduction: GSPMD inserts the all-reduce over both axes
        return ent + jnp.sum(jnp.abs(dets))

    out = step(
        jax.device_put(jnp.asarray(C), rep),
        jax.device_put(jnp.asarray(sizes), shard_c),
        jax.device_put(jnp.asarray(M_aug), rep),
        jax.device_put(jnp.asarray(rows), shard_p),
        jax.device_put(jnp.asarray(cols), shard_p),
    )
    return float(out)


# ----------------------------------------------------------------------
# mesh context: route the PRODUCTION conversion kernels through a mesh
# ----------------------------------------------------------------------

_ACTIVE_MESH: Mesh | None = None


def active_mesh() -> Mesh | None:
    """The mesh installed by :func:`use_mesh` (None = single device)."""
    return _ACTIVE_MESH


class use_mesh:
    """Context manager: run conversions with their batched kernels sharded
    over ``mesh`` — the cut batches of the all-cuts eigendecompositions over
    the "cuts" axis, the determinant/Pfaffian pair batches of the tensor
    fill over the "pairs" axis.  GSPMD inserts the collectives.

    >>> with use_mesh(make_mesh()):
    ...     mps = slater.C_to_MPS(C, {"chi_max": chi})
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False


def shard_batch(x, axis: str = "pairs"):
    """Device-puts a batch array with its leading axis sharded over the
    active mesh (no-op without one).  The batch length must be divisible by
    the axis size (callers use power-of-two bucketed batches)."""
    mesh = _ACTIVE_MESH
    x = jnp.asarray(x)
    if mesh is None:
        return x
    n_ax = mesh.shape[axis]
    if x.shape[0] % n_ax:
        return x
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x):
    """Device-puts an array replicated over the active mesh (no-op without
    one)."""
    mesh = _ACTIVE_MESH
    x = jnp.asarray(x)
    if mesh is None:
        return x
    return jax.device_put(x, NamedSharding(mesh, P()))


def gather_replicated(x):
    """The read side of :func:`bond_shard_put`: materialise one (possibly
    bond-sharded) site tensor as an ordinary unsharded array.  The canonical
    sweeps' working set is ONE site's matrix — gathering a single site while
    the rest of the chain stays sharded preserves the ~1/N per-device
    residency bound the sharding exists for.

    On the in-process CPU platform (virtual meshes) this bounces through
    host memory (a memcpy there): consuming a bond-sharded tensor with
    eager ops compiles cross-grid resharding programs (all-gather /
    collective-permute) whose per-device rendezvous can DEADLOCK under the
    in-process communicator when dispatch order inverts across devices —
    observed at the north-star shape (BASELINE.md round 5); the host bounce
    removes the collective entirely.  On real accelerator platforms it
    reshards on-device (one XLA all-gather over ICI)."""
    if isinstance(x, np.ndarray) or not hasattr(x, "sharding"):
        return x
    try:
        devs = x.sharding.device_set
    except Exception:
        return x
    if len(devs) <= 1:
        return x
    if next(iter(devs)).platform == "cpu":
        return jnp.asarray(np.asarray(x))
    if isinstance(x.sharding, NamedSharding):
        return jax.device_put(x, NamedSharding(x.sharding.mesh, P()))
    return x


def bond_shard_put(x, mesh: Mesh | None = None, min_dim: int = 64):
    """Device-puts an MPS site tensor with its leading (bond) axis sharded
    over ALL devices of ``mesh`` (the flattened mesh, not one axis: tensor
    residency is what the sharding exists to bound — BASELINE.md round 4
    measured the north-star output at 68 GB vs 16 GB of HBM, so every
    device must hold 1/N of every produced tensor).

    Ragged charged bonds rarely divide the device count, so the bond axis
    is split ``g = gcd(bond, n_devices)`` ways and replicated across the
    remaining ``n/g`` devices — per-device residency is ``1/g`` of the
    tensor, degrading gracefully instead of falling back to full
    replication.  No-op when no mesh is active, ``g == 1``, or the bond is
    below ``min_dim`` (tiny edge tensors are cheaper replicated than
    collective-gathered).  Host numpy inputs are left untouched — complex
    tensors cannot live on TPU devices."""
    mesh = mesh if mesh is not None else _ACTIVE_MESH
    if mesh is None or isinstance(x, np.ndarray):
        return x
    n = int(np.prod(list(mesh.shape.values())))
    if n <= 1 or x.ndim == 0 or x.shape[0] < min_dim:
        return x
    g = math.gcd(int(x.shape[0]), n)
    if g <= 1:
        return x
    # (g, n/g) grid over ALL devices (independent of the active mesh's own
    # axes, e.g. multichip_conversion_step's (N, 1) "cuts" grid): shard the
    # bond g ways, replicate across the rest
    grid = Mesh(np.asarray(mesh.devices).reshape(g, n // g), ("_bond", "_rep"))
    spec = P("_bond", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(grid, spec))
