r"""Batched Pfaffians of skew-symmetric matrices.

The reference library evaluates one Pfaffian per MPS-tensor entry by calling
the pfapack C routine in a Python loop (reference pfaffian.py:1413-1426), a
serial bottleneck of O(chi^2) ctypes calls per site.  Here the Parlett-Reid
tridiagonalisation (Wimmer, ACM TOMS 38, 30 (2012)) is written as a
fixed-shape ``lax.fori_loop`` and ``vmap``-ed over the whole batch, so all
Pfaffians of a site evaluate in one device executable.

Mixed sizes batch together through the symplectic padding identity
``Pf(A \oplus J \oplus ... \oplus J) = Pf(A)`` with ``J = [[0, 1], [-1, 0]]``,
analogous to the identity-extension trick used for determinants.

A C++ implementation of the same algorithm (for host-side cross-validation,
playing the role pfapack plays for the reference) lives in
``native/pfaffian.cpp`` with a ctypes binding in
:mod:`temfpy_tpu.ops.native`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import complex_dtype  # noqa: F401  (x64 side effect)


@partial(jax.jit, static_argnames=())
def _pfaffian_single(A):
    """Pfaffian of one (n, n) skew-symmetric matrix, n even and static.

    Parlett-Reid with partial pivoting: at step k (even), pivot the largest
    element of column k below the diagonal into row k+1, multiply the running
    Pfaffian by A[k, k+1], and eliminate the rest of the column with a rank-2
    skew update restricted (by masking) to the trailing block.
    """
    n = A.shape[-1]
    assert n % 2 == 0
    idx = jnp.arange(n)

    def step(i, carry):
        A, pf = carry
        k = 2 * i
        # --- pivot: largest |A[j, k]| for j > k ---
        col = jnp.where(idx > k, jnp.abs(A[:, k]), -1.0)
        kp = jnp.argmax(col)
        swap = kp != k + 1
        perm = idx.at[k + 1].set(kp).at[kp].set(k + 1)
        A = A[perm][:, perm]
        pf = jnp.where(swap, -pf, pf)
        # --- eliminate column k below row k+1 ---
        akk1 = A[k, k + 1]
        safe = jnp.where(akk1 == 0, jnp.ones((), A.dtype), akk1)
        rk = jnp.where(idx > k + 1, A[k, :], 0.0) / safe  # row k, cols > k+1
        ck = jnp.where(idx > k + 1, A[:, k + 1], 0.0)  # col k+1, rows > k+1
        A = A + (jnp.outer(rk, ck) - jnp.outer(ck, rk))
        pf = pf * akk1  # zero pivot => Pfaffian is exactly zero
        return A, pf

    pf0 = jnp.ones((), dtype=A.dtype)
    if n == 0:
        return pf0
    _, pf = jax.lax.fori_loop(0, n // 2, step, (A, pf0))
    return pf


def _pfaffian_batch_last(A):
    """Pfaffians of a (n, n, P) *batch-last* skew-symmetric stack via
    Parlett-Reid with implicit partial pivoting.

    Mirrors :func:`temfpy_tpu.ops.linalg._lu_det_batch_last`: with the batch
    on the lane axis every step is a few elementwise passes over the slab —
    no batched gathers, no row/column movement.  Each step picks the pivot
    pair (a, b) with ``a`` the smallest not-yet-eliminated index and ``b``
    the partner maximising |A[b, a]| (the same choice as the explicit
    kernel), multiplies the running Pfaffian by A[a, b], applies the masked
    rank-2 skew update, and records the pair; the overall sign is the
    inversion parity of the recorded index sequence, by
    ``Pf(P A P^T) = sgn(P) Pf(A)``."""
    n, _, P = A.shape
    assert n % 2 == 0
    idx = jnp.arange(n)
    rone = jnp.ones((), A.dtype)

    def step(i, carry):
        A, pf, done, order = carry
        # a: smallest undone index
        a = jnp.argmax(jnp.where(done, -1, n - idx[:, None]), axis=0)  # (P,)
        oha = idx[:, None] == a[None, :]  # (n,P)
        cola = jnp.sum(A * oha.astype(A.dtype)[None, :, :], axis=1)  # A[:, a]
        cand = jnp.where(done | oha, -1.0, jnp.abs(cola))
        b = jnp.argmax(cand, axis=0)  # (P,)
        ohb = idx[:, None] == b[None, :]
        piv = jnp.sum(cola * ohb.astype(A.dtype), axis=0)  # A[b, a]
        pf = pf * (-piv)  # A[a, b] = -A[b, a]
        done = done | oha | ohb
        safe = jnp.where(piv == 0, rone, piv)
        u = jnp.where(done, 0.0, cola / safe[None, :])  # A[a, r] / A[a, b]
        colb = jnp.sum(A * ohb.astype(A.dtype)[None, :, :], axis=1)  # A[:, b]
        c = jnp.where(done, 0.0, colb)
        A = A + u[:, None, :] * c[None, :, :] - c[:, None, :] * u[None, :, :]
        order = order.at[2 * i].set(a.astype(order.dtype))
        order = order.at[2 * i + 1].set(b.astype(order.dtype))
        return A, pf, done, order

    init = (
        A,
        jnp.ones((P,), A.dtype),
        jnp.zeros((n, P), bool),
        jnp.zeros((n, P), jnp.int32),
    )
    _, pf, _, order = jax.lax.fori_loop(0, n // 2, step, init)
    inversions = jnp.sum(
        (order[:, None, :] > order[None, :, :])
        & (idx[:, None, None] < idx[None, :, None]),
        axis=(0, 1),
    )
    return jnp.where(inversions % 2 == 1, -pf, pf)


def _pfaffian_batch_last_split(Ar, Ai):
    """Split-complex variant of :func:`_pfaffian_batch_last`: the (n, n, P)
    complex skew-symmetric stack is carried as separate real/imaginary f64
    planes and every operation is real elementwise arithmetic.

    This is the TPU-ready form of the complex Pfaffian kernel: the current
    axon v5e runtime cannot device_put complex128 at all and raises
    UNIMPLEMENTED on most complex64 executables (BASELINE.md platform
    notes), while real f64 elementwise ops run at full speed.  Returns
    (pf_real, pf_imag)."""
    n, _, P = Ar.shape
    assert n % 2 == 0 and Ai.shape == Ar.shape
    idx = jnp.arange(n)

    def step(i, carry):
        Ar, Ai, pfr, pfi, done, order = carry
        a = jnp.argmax(jnp.where(done, -1, n - idx[:, None]), axis=0)  # (P,)
        oha = idx[:, None] == a[None, :]
        ohd = oha.astype(Ar.dtype)
        colar = jnp.sum(Ar * ohd[None, :, :], axis=1)  # Re A[:, a]
        colai = jnp.sum(Ai * ohd[None, :, :], axis=1)  # Im A[:, a]
        mag2 = colar * colar + colai * colai
        cand = jnp.where(done | oha, -1.0, mag2)
        b = jnp.argmax(cand, axis=0)
        ohb = idx[:, None] == b[None, :]
        ohbd = ohb.astype(Ar.dtype)
        pivr = jnp.sum(colar * ohbd, axis=0)  # Re A[b, a]
        pivi = jnp.sum(colai * ohbd, axis=0)
        # pf *= -A[b, a]
        pfr, pfi = -(pfr * pivr - pfi * pivi), -(pfr * pivi + pfi * pivr)
        done = done | oha | ohb
        den = pivr * pivr + pivi * pivi
        safe = jnp.where(den == 0, 1.0, den)
        # u = col_a / A[b, a]
        ur = jnp.where(done, 0.0, (colar * pivr + colai * pivi) / safe)
        ui = jnp.where(done, 0.0, (colai * pivr - colar * pivi) / safe)
        colbr = jnp.sum(Ar * ohbd[None, :, :], axis=1)  # Re A[:, b]
        colbi = jnp.sum(Ai * ohbd[None, :, :], axis=1)
        cr = jnp.where(done, 0.0, colbr)
        ci = jnp.where(done, 0.0, colbi)
        # A += u c^T - c u^T (complex, expanded)
        ucr = ur[:, None, :] * cr[None, :, :] - ui[:, None, :] * ci[None, :, :]
        uci = ur[:, None, :] * ci[None, :, :] + ui[:, None, :] * cr[None, :, :]
        Ar = Ar + ucr - jnp.swapaxes(ucr, 0, 1)
        Ai = Ai + uci - jnp.swapaxes(uci, 0, 1)
        order = order.at[2 * i].set(a.astype(order.dtype))
        order = order.at[2 * i + 1].set(b.astype(order.dtype))
        return Ar, Ai, pfr, pfi, done, order

    init = (
        Ar,
        Ai,
        jnp.ones((P,), Ar.dtype),
        jnp.zeros((P,), Ar.dtype),
        jnp.zeros((n, P), bool),
        jnp.zeros((n, P), jnp.int32),
    )
    Ar, Ai, pfr, pfi, _, order = jax.lax.fori_loop(0, n // 2, step, init)
    inversions = jnp.sum(
        (order[:, None, :] > order[None, :, :])
        & (idx[:, None, None] < idx[None, :, None]),
        axis=(0, 1),
    )
    sign = jnp.where(inversions % 2 == 1, -1.0, 1.0)
    return pfr * sign, pfi * sign


def batched_pfaffian_split(Ar, Ai, chunk: int | None = None):
    """Pfaffians of complex skew-symmetric matrices given as separate
    real/imaginary planes: (..., n, n) + (..., n, n) -> ((...,), (...,)).

    The complex dtype never materialises on the device — this is the entry
    point for TPU backends without complex support."""
    Ar = jnp.asarray(Ar)
    Ai = jnp.asarray(Ai)
    *batch, n, m = Ar.shape
    assert n == m and n % 2 == 0 and Ai.shape == Ar.shape
    fr = Ar.reshape((-1, n, n))
    fi = Ai.reshape((-1, n, n))
    if n == 0:
        one = jnp.ones(fr.shape[0], Ar.dtype).reshape(batch)
        return one, jnp.zeros_like(one)
    outs_r, outs_b = [], []
    nb = fr.shape[0]
    step = nb if chunk is None else chunk
    for i in range(0, nb, step):
        r, b = _pf_split_jit(fr[i : i + step], fi[i : i + step])
        outs_r.append(r)
        outs_b.append(b)
    pr = jnp.concatenate(outs_r) if len(outs_r) > 1 else outs_r[0]
    pi = jnp.concatenate(outs_b) if len(outs_b) > 1 else outs_b[0]
    return pr.reshape(batch), pi.reshape(batch)


@jax.jit
def _pf_split_jit(fr, fi):
    return _pfaffian_batch_last_split(
        jnp.transpose(fr, (1, 2, 0)), jnp.transpose(fi, (1, 2, 0))
    )


@jax.jit
def _pfaffian_batch(flat):
    """(B, n, n) batch dispatch: batch-last elementwise kernel on
    accelerators, cache-friendly vmapped kernel on CPU."""
    if flat.shape[-1] >= 2 and jax.default_backend() != "cpu":
        return _pfaffian_batch_last(jnp.transpose(flat, (1, 2, 0)))
    return jax.vmap(_pfaffian_single)(flat)


def batched_pfaffian(matrices, chunk: int | None = None):
    """Pfaffians of a batch of skew-symmetric matrices.

    Parameters
    ----------
    matrices: (..., n, n) array, n even.  The batch axes are flattened.
    chunk: optional micro-batch size.

    Returns
    -------
    (...,) array of Pfaffians.
    """
    matrices = jnp.asarray(matrices)
    *batch, n, m = matrices.shape
    assert n == m, "matrices must be square"
    assert n % 2 == 0, "Pfaffian requires even dimension"
    flat = matrices.reshape((-1, n, n))
    if n == 0:
        return jnp.ones(flat.shape[0], dtype=matrices.dtype).reshape(batch)
    nb = flat.shape[0]
    if chunk is None or nb <= chunk:
        out = _pfaffian_batch(flat)
    else:
        out = jnp.concatenate(
            [_pfaffian_batch(flat[i : i + chunk]) for i in range(0, nb, chunk)]
        )
    return out.reshape(batch)


def symplectic_pad(N, pad: int):
    """Returns ``block_diag(N, J, ..., J)`` with ``pad // 2`` copies of
    ``J = [[0, 1], [-1, 0]]``; Pf of any principal submatrix built from the
    original indices plus an even, aligned run of padding indices equals the
    Pfaffian of the unpadded submatrix."""
    assert pad % 2 == 0
    N = jnp.asarray(N)
    m = N.shape[-1]
    out = jnp.zeros(N.shape[:-2] + (m + pad, m + pad), dtype=N.dtype)
    out = out.at[..., :m, :m].set(N)
    J = jnp.array([[0.0, 1.0], [-1.0, 0.0]], dtype=N.dtype)
    blocks = jnp.kron(jnp.eye(pad // 2, dtype=N.dtype), J)
    out = out.at[..., m:, m:].set(blocks)
    return out


def _pad_split_planes(Nr, Ni, pad_slots: int):
    """Symplectic-J padding of a split-complex plane pair (J lives on the
    real plane; the imaginary plane zero-pads).  Called inside jit so the
    padding fuses into the consuming kernel instead of costing eager
    dispatches per site (measured 113 s of a 133 s p+ip conversion on CPU,
    and one tunnel round trip per op on TPU)."""
    Nr = symplectic_pad(Nr, pad_slots)
    m = Ni.shape[-1]
    Ni = jnp.zeros(
        Ni.shape[:-2] + (m + pad_slots, m + pad_slots), dtype=Ni.dtype
    ).at[..., :m, :m].set(Ni)
    return Nr, Ni


@partial(jax.jit, static_argnames=("pad_slots",))
def _pf_pairs_impl(N, idx, *, pad_slots=0):
    N_aug = symplectic_pad(N, pad_slots) if pad_slots else N
    sub = N_aug[idx[:, :, None], idx[:, None, :]]
    return _pfaffian_batch(sub)


@partial(jax.jit, static_argnames=("pad_slots",))
def _pf_pairs_split_impl(Nr, Ni, idx, *, pad_slots=0):
    from .linalg import gather_submatrices

    if pad_slots:
        Nr, Ni = _pad_split_planes(Nr, Ni, pad_slots)
    sub_r = gather_submatrices(Nr, idx, idx)
    sub_i = gather_submatrices(Ni, idx, idx)
    return _pfaffian_batch_last_split(
        jnp.transpose(sub_r, (1, 2, 0)), jnp.transpose(sub_i, (1, 2, 0))
    )


def batched_pfaffian_pairs_split(Nr, Ni, idx, pad_slots: int, chunk: int | None = None):
    """Split-complex variant of :func:`batched_pfaffian_pairs`: the parent
    matrix is given as (re, im) device planes and the Pfaffians come back as
    (re, im) device vectors — the TPU entry point of the Pfaffian tensor
    fill (complex never materialises on device).  The symplectic J-block
    padding lives entirely on the real plane."""
    Nr = jnp.asarray(Nr)
    Ni = jnp.asarray(Ni)
    idx = jnp.asarray(idx, dtype=jnp.int32)
    w = idx.shape[1]
    if w == 0:
        one = jnp.ones((idx.shape[0],), dtype=Nr.dtype)
        return one, jnp.zeros_like(one)
    assert w % 2 == 0, "total index count per row must be even"
    from ..parallel.mesh import replicate, shard_batch

    Nr = replicate(Nr)
    Ni = replicate(Ni)
    idx = shard_batch(idx)
    P = idx.shape[0]
    if chunk is None or P <= chunk:
        return _pf_pairs_split_impl(Nr, Ni, idx, pad_slots=pad_slots)
    outs = [
        _pf_pairs_split_impl(Nr, Ni, idx[i : i + chunk], pad_slots=pad_slots)
        for i in range(0, P, chunk)
    ]
    return (
        jnp.concatenate([o[0] for o in outs]),
        jnp.concatenate([o[1] for o in outs]),
    )


def _derive_pair_indices(pos_b, pos_k, cnt_b, cnt_k, pr, pc, width, m):
    """Derives the (P, width) combined index rows of the pair-Pfaffian batch
    on device: ket excitation positions first, then bra positions, then a
    contiguous tail of symplectic-padding sentinels starting at ``m``.
    ``pos_*`` are per-unique-bond position tables, ``cnt_*`` the excitation
    counts, ``pr``/``pc`` the (P,) pair-id vectors."""
    nk = cnt_k[pc]
    nb = cnt_b[pr]
    tot = nk + nb
    s = jnp.arange(width, dtype=jnp.int32)[None, :]
    kslot = jnp.minimum(s, pos_k.shape[1] - 1)
    ket_vals = pos_k[pc[:, None], kslot]
    bslot = jnp.clip(s - nk[:, None], 0, pos_b.shape[1] - 1)
    bra_vals = pos_b[pr[:, None], bslot]
    pad_vals = m + (s - tot[:, None])
    idx = jnp.where(
        s < nk[:, None], ket_vals,
        jnp.where(s < tot[:, None], bra_vals, pad_vals),
    )
    return idx.astype(jnp.int32)


def _pf_pairs_packed_split_fn(Nr, Ni, flat, *, width, m, pad_slots,
                              shapes):
    """Packed split-complex pair Pfaffians: all int32 plan fields arrive in
    ONE flat buffer (pos_b, pos_k, cnt_b, cnt_k, pr, pc concatenated) —
    uploads over the TPU tunnel pay a per-transfer round trip, and the
    (P, width) index matrix itself is derived on device (host->device index
    traffic O(chi * w + P) instead of O(P * w)).  The symplectic padding
    also fuses in here (eager padding cost one dispatch per op per site)."""
    from .linalg import gather_submatrices

    if pad_slots:
        Nr, Ni = _pad_split_planes(Nr, Ni, pad_slots)
    (R, wtb), (K, wtk), P = shapes
    sizes = [R * wtb, K * wtk, R, K, P, P]
    parts, o = [], 0
    for nsz in sizes:
        parts.append(flat[o : o + nsz])
        o += nsz
    pos_b = parts[0].reshape(R, wtb)
    pos_k = parts[1].reshape(K, wtk)
    cnt_b, cnt_k, pr, pc = parts[2:]
    idx = _derive_pair_indices(pos_b, pos_k, cnt_b, cnt_k, pr, pc, width, m)
    sub_r = gather_submatrices(Nr, idx, idx)
    sub_i = gather_submatrices(Ni, idx, idx)
    return _pfaffian_batch_last_split(
        jnp.transpose(sub_r, (1, 2, 0)), jnp.transpose(sub_i, (1, 2, 0))
    )


_pf_pairs_packed_split_impl = partial(
    jax.jit, static_argnames=("width", "m", "pad_slots", "shapes")
)(_pf_pairs_packed_split_fn)


@lru_cache(maxsize=None)
def _pf_pairs_packed_split_sharded(mesh):
    """Mesh variant: the output Pfaffian vectors shard over the "pairs"
    axis, so GSPMD partitions the per-pair gather/LU work across chips
    (the plan buffer itself stays fused/replicated — only O(chi*w + P)
    int32s)."""
    from jax.sharding import NamedSharding, PartitionSpec

    out = NamedSharding(mesh, PartitionSpec("pairs"))
    return partial(
        jax.jit,
        static_argnames=("width", "m", "pad_slots", "shapes"),
        out_shardings=(out, out),
    )(_pf_pairs_packed_split_fn)


def batched_pfaffian_pairs_packed_split(
    Nr, Ni, pos_b, pos_k, cnt_b, cnt_k, pr, pc,
    width: int, pad_slots: int, chunk: int | None = None,
):
    """Split-complex pair Pfaffians from packed host tables (see
    :func:`_derive_pair_indices` for the layout).  ``pos_*``/``cnt_*``/
    ``pr``/``pc`` are host int32 arrays; each dispatch ships them as one
    fused transfer.  Sentinel pair ids must point at a table row with
    count 0, which yields an all-padding index row (Pf = 1)."""
    Nr = jnp.asarray(Nr)
    Ni = jnp.asarray(Ni)
    if width == 0:
        one = jnp.ones((len(pr),), dtype=Nr.dtype)
        return one, jnp.zeros_like(one)
    assert width % 2 == 0, "total index count per row must be even"
    m = Nr.shape[-1]
    from ..parallel.mesh import active_mesh, replicate

    Nr = replicate(Nr)
    Ni = replicate(Ni)
    mesh = active_mesh()
    impl = _pf_pairs_packed_split_impl
    if mesh is not None:
        n_ax = mesh.shape.get("pairs", 1)
        if n_ax > 1 and len(pr) % n_ax == 0 and (
            chunk is None or chunk % n_ax == 0
        ):
            impl = _pf_pairs_packed_split_sharded(mesh)
    shapes_head = (pos_b.shape, pos_k.shape)
    head = [
        np.asarray(pos_b, np.int32).ravel(), np.asarray(pos_k, np.int32).ravel(),
        np.asarray(cnt_b, np.int32), np.asarray(cnt_k, np.int32),
    ]
    pr = np.asarray(pr, np.int32)
    pc = np.asarray(pc, np.int32)
    P = len(pr)
    step = P if chunk is None or P <= chunk else chunk
    outs = []
    for i in range(0, P, step):
        pr_c, pc_c = pr[i : i + step], pc[i : i + step]
        flat = jnp.asarray(np.concatenate(head + [pr_c, pc_c]))
        outs.append(
            impl(
                Nr, Ni, flat, width=width, m=m, pad_slots=pad_slots,
                shapes=shapes_head + (len(pr_c),),
            )
        )
    if len(outs) == 1:
        return outs[0]
    return (
        jnp.concatenate([o[0] for o in outs]),
        jnp.concatenate([o[1] for o in outs]),
    )


def batched_pfaffian_pairs(N, idx, pad_slots: int, chunk: int | None = None):
    """Pfaffians ``Pf(N[idx[p], idx[p]])`` for a flat list of index rows.

    Index slots holding values >= N.shape[0] address a symplectic (J-block)
    extension appended to ``N``; each row's padding must be a contiguous tail
    of consecutive sentinels starting at ``N.shape[0]`` with an even count,
    so the padded Pfaffian equals the unpadded one exactly (no permutation
    sign).  An all-sentinel row evaluates to 1 (batch-axis padding).
    """
    N = jnp.asarray(N)
    idx = jnp.asarray(idx, dtype=jnp.int32)
    w = idx.shape[1]
    if w == 0:
        return jnp.ones((idx.shape[0],), dtype=N.dtype)
    assert w % 2 == 0, "total index count per row must be even"
    from ..parallel.mesh import replicate, shard_batch

    N = replicate(N)
    idx = shard_batch(idx)
    P = idx.shape[0]
    if chunk is None or P <= chunk:
        return _pf_pairs_impl(N, idx, pad_slots=pad_slots)
    return jnp.concatenate(
        [_pf_pairs_impl(N, idx[i : i + chunk], pad_slots=pad_slots)
         for i in range(0, P, chunk)]
    )


@partial(jax.jit, static_argnames=("pad_slots",))
def _pf_gather_impl(N_aug, bra_idx, ket_idx, *, pad_slots=0):
    if pad_slots:
        N_aug = symplectic_pad(N_aug, pad_slots)
    # sub[i, j, s, t] = N_aug[row[i,j,s], row[i,j,t]] where row = concat indices
    rows = jnp.concatenate(
        (
            jnp.broadcast_to(
                ket_idx[None, :, :], (bra_idx.shape[0],) + ket_idx.shape
            ),
            jnp.broadcast_to(
                bra_idx[:, None, :], (bra_idx.shape[0], ket_idx.shape[0], bra_idx.shape[1])
            ),
        ),
        axis=-1,
    )
    sub = N_aug[rows[..., :, None], rows[..., None, :]]
    k = sub.shape[-1]
    flat = sub.reshape((-1, k, k))
    pf = _pfaffian_batch(flat)
    return pf.reshape(sub.shape[:2])


def batched_pfaffian_gather(N, bra_idx, ket_idx, pad_slots: int, chunk: int | None = None):
    """Pfaffians ``Pf(N[ix, ix])`` with ``ix = concat(ket_idx[j], bra_idx[i])``
    for all pairs (i, j), as needed for Bogoliubov-excitation overlaps
    (reference pfaffian.py:1429-1479).

    Padding: index slots holding values >= N.shape[0] address a symplectic
    (J-block) extension of ``N``.  Within one call, every (bra, ket) pair must
    use the same total number of padding slots laid out as
    ``N.shape[0] + 0, ..., N.shape[0] + pad_slots - 1`` split between the two
    index lists such that the concatenated run is a contiguous, even-aligned
    sequence (the callers guarantee this by padding only at the tail of
    ``bra_idx``).

    Parameters
    ----------
    N: (m, m) skew-symmetric parent matrix.
    bra_idx: (nb, kb) int index lists (may include padding sentinels).
    ket_idx: (nk, kk) int index lists.
    pad_slots: number of J-extension rows to append (even).

    Returns
    -------
    (nb, nk) array of Pfaffians.
    """
    N = jnp.asarray(N)
    bra_idx = jnp.asarray(bra_idx, dtype=jnp.int32)
    ket_idx = jnp.asarray(ket_idx, dtype=jnp.int32)
    k = bra_idx.shape[1] + ket_idx.shape[1]
    if k == 0:
        return jnp.ones((bra_idx.shape[0], ket_idx.shape[0]), dtype=N.dtype)
    assert k % 2 == 0, "total excitation count per pair must be even"
    nb = bra_idx.shape[0]
    if chunk is None or nb <= chunk:
        return _pf_gather_impl(N, bra_idx, ket_idx, pad_slots=pad_slots)
    outs = [
        _pf_gather_impl(N, bra_idx[i : i + chunk], ket_idx,
                        pad_slots=pad_slots)
        for i in range(0, nb, chunk)
    ]
    return jnp.concatenate(outs, axis=0)


def pfaffian_numpy(A: np.ndarray) -> complex:
    """Reference host implementation (Parlett-Reid, partial pivoting) used in
    tests to cross-check the device kernel."""
    A = np.array(A, dtype=complex)
    n = A.shape[0]
    assert A.shape == (n, n)
    if n % 2 == 1:
        return 0.0
    pf = 1.0 + 0.0j
    for k in range(0, n - 1, 2):
        kp = k + 1 + int(np.argmax(np.abs(A[k + 1 :, k])))
        if kp != k + 1:
            A[[k + 1, kp], :] = A[[kp, k + 1], :]
            A[:, [k + 1, kp]] = A[:, [kp, k + 1]]
            pf = -pf
        if A[k + 1, k] == 0.0:
            return 0.0
        pf *= A[k, k + 1]
        if k + 2 < n:
            tau = A[k, k + 2 :] / A[k, k + 1]
            A[k + 2 :, k + 2 :] += np.outer(tau, A[k + 2 :, k + 1])
            A[k + 2 :, k + 2 :] -= np.outer(A[k + 2 :, k + 1], tau)
    return complex(pf)
