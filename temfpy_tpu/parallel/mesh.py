"""Device meshes and sharded kernels (jax.sharding + GSPMD collectives)."""

from __future__ import annotations

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
    """One full (tiny) conversion step jitted over the mesh: sharded-cut
    eigendecompositions, a sharded determinant fill, and a cross-device
    reduction — exercising dp-like ("cuts") and tp-like ("pairs") shardings
    plus the GSPMD-inserted collectives.

    Returns a finite scalar (checked by the caller).
    """
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
