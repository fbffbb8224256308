"""Matrix product state container with dense device tensors and host charge
labels.

Replaces the TeNPy ``networks.mps.MPS`` surface used by the reference
(constructor with form/bc/unit_cell_width, get_SL/get_B, overlap,
correlation_function, entanglement_spectrum, canonical forms, total charge,
segment extraction; cf. SURVEY.md section 2.2).

Conventions
-----------
- Site tensors have shape (chiL, d, chiR) and live on device (jax arrays).
- ``form[i]`` is 'A' (left-canonical), 'B' (right-canonical), or None.
- Schmidt values ``S[i]`` (host numpy) sit on bond i (left of site i);
  finite MPS store L+1 of them with S[0] = S[L] = [1.]; infinite MPS store
  L+1 with S[L] == S[0] (the wrap-around bond).
- The state is  S[0]^(a0) T_0 ... T_{L-1} S[L]^(aL)  where mixed canonical
  form 'A'*c + 'B'*(L-c) inserts diag(S[c]) between sites c-1 and c.
- ``q_bond[i]`` holds one integer charge label per bond index; by convention
  the label is the total charge to the LEFT of the bond.  Tensor i satisfies
  q_bond[i][a] + q_phys[n] == q_bond[i+1][b] + qtotal[i] on nonzero entries.
"""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np

import jax.numpy as jnp

from ..config import complex_dtype, complex_on_device  # noqa: F401  (x64 side effect)
from .charges import ChargeInfo, NO_CHARGE, sectors_of
from .charged_linalg import charged_eigh, charged_qr, charged_svd
from ..ops.linalg import robust_eigh, robust_qr, robust_svd
from .site import Site

logger = logging.getLogger(__name__)


def _as_tensor(B):
    """Device tensor, except complex tensors stay host numpy on backends
    without device complex support (TPU: complex128 device_put blocks), and
    CPU-committed tensors under an accelerator default backend convert to
    numpy (free — same memory space).  The latter matters for the
    small-problem XLA:CPU reroute (config.compute_context): per-op jax
    dispatch in an accelerator process costs ~0.4 ms, so the many tiny ops
    of the downstream sweeps/observables run in plain numpy instead."""
    if np.iscomplexobj(B) and not complex_on_device():
        return np.asarray(B)
    import jax

    if jax.default_backend() not in ("cpu",):
        if isinstance(B, np.ndarray):
            return B  # host stays host; big conversions hand over jax arrays
        if isinstance(B, jax.Array):
            try:
                (d,) = B.devices()
            except ValueError:
                d = None
            if d is not None and d.platform == "cpu":
                return np.asarray(B)
    return jnp.asarray(B)


class MPS:
    """A finite or infinite matrix product state."""

    def __init__(
        self,
        sites: Sequence[Site],
        Bs,
        SVs,
        *,
        form="B",
        bc: str = "finite",
        unit_cell_width: int | None = None,
        q_bonds=None,
        qtotals=None,
        norm: float = 1.0,
    ):
        self.sites = list(sites)
        L = len(self.sites)
        self._B = [_as_tensor(B) for B in Bs]
        assert len(self._B) == L, "need one tensor per site"
        if isinstance(form, str):
            form = [form] * L
        self.form = list(form)
        assert bc in ("finite", "infinite"), f"unsupported bc {bc!r}"
        self.bc = bc
        self.norm = norm

        # Schmidt values: normalise container to L+1 entries
        SVs = [None if s is None else np.asarray(s, dtype=float) for s in SVs]
        if len(SVs) == L:  # infinite convention without the wrap bond
            SVs = SVs + [SVs[0]]
        assert len(SVs) == L + 1, "need L+1 Schmidt-value vectors"
        self._S = SVs

        self.chinfo: ChargeInfo = self.sites[0].chinfo if self.sites else NO_CHARGE
        if q_bonds is None:
            q_bonds = [np.zeros(self.chi(i), dtype=np.int64) for i in range(L + 1)]
        self.q_bond = [np.asarray(q, dtype=np.int64) for q in q_bonds]
        assert len(self.q_bond) == L + 1
        self.qtotal = (
            np.zeros(L, dtype=np.int64)
            if qtotals is None
            else np.asarray(qtotals, dtype=np.int64).copy()
        )
        self.unit_cell_width = unit_cell_width if unit_cell_width is not None else L
        self.grouped = 1

    # ------------------------------------------------------------------
    # basic accessors
    # ------------------------------------------------------------------
    @property
    def L(self) -> int:
        return len(self.sites)

    @property
    def N_sites_per_hor_spacing(self) -> int:
        """Reference-named alias of :attr:`unit_cell_width` (TeNPy
        MPSGeometry's cylinder bookkeeping, used by reference
        iMPS.py:322-352)."""
        return self.unit_cell_width

    @property
    def finite(self) -> bool:
        return self.bc == "finite"

    @property
    def dims(self):
        return [s.d for s in self.sites]

    def chi(self, bond: int) -> int:
        """Bond dimension at bond i (left of site i)."""
        L = self.L
        if bond < L:
            return int(self._B[bond].shape[0])
        return int(self._B[L - 1].shape[2])

    @property
    def chi_max(self) -> int:
        return max(self.chi(i) for i in range(self.L + 1))

    def get_SL(self, i: int) -> np.ndarray:
        return self._S[i]

    def get_SR(self, i: int) -> np.ndarray:
        return self._S[i + 1]

    def device_context(self):
        """Context manager pinning jax work to the device this MPS's tensors
        live on.  A small-problem conversion rerouted to XLA:CPU
        (config.compute_context) leaves tensors committed to the CPU device
        while the default backend is still the accelerator; without the
        context, fresh arrays (jnp.zeros, uploads) would land on the
        accelerator and every subsequent op would pay tunnel round trips."""
        import contextlib
        import jax

        t = self._B[0]
        if isinstance(t, np.ndarray):
            return contextlib.nullcontext()
        try:
            (d,) = t.devices()
        except Exception:
            return contextlib.nullcontext()
        if d.platform != jax.default_backend():
            from ..config import _cpu_reroute

            if d.platform == "cpu":
                return _cpu_reroute(d)
            return jax.default_device(d)
        return contextlib.nullcontext()

    def copy(self) -> "MPS":
        out = MPS(
            self.sites,
            list(self._B),
            [None if s is None else s.copy() for s in self._S],
            form=list(self.form),
            bc=self.bc,
            unit_cell_width=self.unit_cell_width,
            q_bonds=[q.copy() for q in self.q_bond],
            qtotals=self.qtotal.copy(),
            norm=self.norm,
        )
        return out

    def get_total_charge(self, only_physical: bool = False) -> int:
        """Total charge of the state.

        ``only_physical=True`` returns the physical charge of the support
        (summing the charge rule over all tensors: q_bond[L] - q_bond[0] +
        sum of qtotals), which is invariant under relabelings; the default
        returns the gauge charge (sum of tensor qtotals), which
        :meth:`gauge_total_charge` adjusts."""
        qt = int(self.qtotal.sum())
        if only_physical:
            qt += int(self.q_bond[-1][0]) - int(self.q_bond[0][0])
        return int(self.chinfo.make_valid(qt))

    def gauge_total_charge(self, qtotal_new: int = 0, site: int = 0) -> "MPS":
        """Relabels charges so the gauge charge (sum of tensor qtotals)
        becomes ``qtotal_new``: the chosen tensor's qtotal absorbs the
        difference and every bond to its right shifts oppositely, keeping
        all charge rules and the physical charge invariant (replaces TeNPy
        ``MPS.gauge_total_charge``, reference gutzwiller.py:218,400,
        iMPS.py:438)."""
        d = int(qtotal_new) - self.get_total_charge()
        if d == 0:
            return self
        self.qtotal[site] += d
        for k in range(site + 1, self.L + 1):
            self.q_bond[k] = self.chinfo.make_valid(
                np.asarray(self.q_bond[k], np.int64) - d
            )
        return self

    def extract_segment(self, first: int, last: int) -> "MPS":
        """A finite MPS holding the (right-canonical) tensors of sites
        ``first..last`` inclusive, with the surrounding Schmidt values on
        its boundary bonds (replaces TeNPy ``MPS.extract_segment``,
        reference iMPS.py:384-412).  Indices may exceed L for infinite MPS
        (unit cells repeat)."""
        idx = range(first, last + 1)
        Bs = [self.get_B(i % self.L if not self.finite else i, "B") for i in idx]
        svs = [self._S[i % self.L if not self.finite else i] for i in idx]
        svs.append(
            self._S[(last + 1) % self.L if not self.finite else last + 1]
        )
        sites = [self.sites[i % self.L] for i in idx]
        if self.finite:
            q_bonds = [self.q_bond[i] for i in idx] + [self.q_bond[last + 1]]
        else:
            # wrapped bonds of a drifting cell shift by the constant per-cell
            # charge drift delta (q_bond[L] = q_bond[0] + delta, as kept by
            # canonical_form_infinite)
            delta = int(self.q_bond[self.L][0]) - int(self.q_bond[0][0])

            def q_at(i):
                return np.asarray(self.q_bond[i % self.L], np.int64) + (
                    i // self.L
                ) * delta

            q_bonds = [q_at(i) for i in idx] + [q_at(last + 1)]
        qts = [self.qtotal[i % self.L] for i in idx]
        return MPS(
            sites, Bs, svs, form="B", bc="finite",
            q_bonds=q_bonds, qtotals=qts, norm=self.norm,
        )

    def splice(self, imps: "MPS", cut: int, n_cells: int) -> "MPS":
        """A finite MPS with ``n_cells`` copies of the infinite unit cell
        ``imps`` inserted at bond ``cut``.

        The standard validation of an iMPS extraction (reference
        examples/iMPS*.py): splice the extracted cell back into the finite
        state it came from and overlap against an independently converted
        longer chain — the overlap approaches 1 when the cell is converged.
        The inserted tensors keep right-canonical ("B") form; the
        surrounding tensors and Schmidt values are untouched."""
        assert self.finite, "splice target must be a finite MPS"
        assert not imps.finite, "spliced cell must be an infinite MPS"
        cell = imps.L
        sites = self.sites[:cut] + imps.sites * n_cells + self.sites[cut:]
        Bs = (
            list(self._B[:cut])
            + list(imps._B) * n_cells
            + list(self._B[cut:])
        )
        svs = (
            list(self._S[:cut])
            + [imps._S[j] for j in range(cell)] * n_cells
            + list(self._S[cut:])
        )
        form = (
            self.form[:cut] + ["B"] * (cell * n_cells) + self.form[cut:]
        )
        return MPS(sites, Bs, svs, form=form, bc="finite")

    def group_sites(self, n: int = 2) -> "MPS":
        """Combines every ``n`` consecutive sites into one grouped site with
        fused physical legs (replaces TeNPy ``MPS.group_sites``, reference
        gutzwiller.py:409).  Grouped sites carry the fused charge labels;
        named operators of the constituents are not regrouped."""
        assert self.L % n == 0, f"L = {self.L} not divisible by group size {n}"
        from .charges import fuse
        from .site import GroupedSite

        Lg = self.L // n
        Bs, sites, q_bonds, qts, svs = [], [], [self.q_bond[0]], [], [self._S[0]]
        for g in range(Lg):
            # route through _as_tensor so complex (Pfaffian) tensors stay on
            # the host when the backend cannot hold complex dtypes (TPU)
            T = _as_tensor(self.get_B(n * g, "B"))
            xp = np if isinstance(T, np.ndarray) else jnp
            for j in range(1, n):
                Tj = xp.asarray(self.get_B(n * g + j, "B"))
                a, d1, b = T.shape
                _, d2, c = Tj.shape
                T = xp.einsum("anb,bmc->anmc", T, Tj).reshape(a, d1 * d2, c)
            Bs.append(T)
            members = [self.sites[n * g + j] for j in range(n)]
            q = members[0].charges
            for m in members[1:]:
                q = fuse(q, m.charges, self.chinfo)
            sites.append(GroupedSite(members, q, self.chinfo))
            q_bonds.append(self.q_bond[n * (g + 1)])
            qts.append(int(self.qtotal[n * g : n * (g + 1)].sum()))
            svs.append(self._S[n * (g + 1)])
        out = MPS(
            sites, Bs, svs, form="B", bc=self.bc,
            unit_cell_width=self.unit_cell_width,
            q_bonds=q_bonds, qtotals=qts, norm=self.norm,
        )
        out.grouped = self.grouped * n
        return out

    # ------------------------------------------------------------------
    # form handling
    # ------------------------------------------------------------------
    def _dS(self, i: int, inverse: bool = False, cutoff: float = 1e-14):
        S = self._S[i]
        if S is None:
            raise ValueError(f"Schmidt values on bond {i} unknown")
        if inverse:
            S = np.where(S > cutoff, 1.0 / np.maximum(S, cutoff), 0.0)
        # host array: broadcasting follows the tensor's own backend (jnp for
        # real device tensors, numpy for complex host tensors on TPU)
        return np.asarray(S)

    def get_B(self, i: int, form: str = "B"):
        """Site tensor in the requested canonical form ('A', 'B', 'Th', 'G').

        Conversions multiply/divide by neighbouring Schmidt values, exactly
        as TeNPy does (inverse Schmidt values amplify noise by at most
        1/svd_min; this mirrors the reference's behaviour).
        """
        i = i % self.L if not self.finite else i
        T = self._B[i]
        have = self.form[i]
        if have is None:
            raise ValueError(f"tensor {i} has no canonical form")
        if form == have:
            return T
        # exponents of S_left, S_right for each form
        expo = {"A": (1, 0), "B": (0, 1), "Th": (1, 1), "G": (0, 0)}
        (al, ar), (bl, br) = expo[have], expo[form]
        dl, dr = bl - al, br - ar
        if dl == 1:
            T = self._dS(i)[:, None, None] * T
        elif dl == -1:
            T = self._dS(i, inverse=True)[:, None, None] * T
        if dr == 1:
            T = T * self._dS(i + 1)[None, None, :]
        elif dr == -1:
            T = T * self._dS(i + 1, inverse=True)[None, None, :]
        return T

    def exact_tensors(self):
        """Tensors G_0..G_{L-1} whose plain contraction equals the state
        (finite MPS): Schmidt values at the A|B junction are absorbed.

        Requires every form to be 'A' or 'B' with all 'A's left of all 'B's.
        """
        assert self.finite, "exact_tensors is for finite MPS"
        forms = self.form
        assert all(f in ("A", "B") for f in forms), f"non-canonical forms {forms}"
        c = forms.index("B") if "B" in forms else self.L
        assert all(f == "A" for f in forms[:c]) and all(
            f == "B" for f in forms[c:]
        ), f"mixed-up forms {forms}"
        out = []
        for i in range(self.L):
            T = self._B[i]
            if i == c:
                T = self._dS(i)[:, None, None] * T
            out.append(T)
        if c == self.L:  # all A: multiply trailing S (norm factor) into last
            out[-1] = out[-1] * self._dS(self.L)[None, None, :]
        # NB self.norm (weight lost to truncation/projection) is deliberately
        # NOT folded in: the canonical tensors represent the normalised state
        return out

    # ------------------------------------------------------------------
    # contractions
    # ------------------------------------------------------------------
    @staticmethod
    def _env_update(E, Tb, Tk, op=None):
        """E' = Tb^dagger E Tk with optional on-site operator on the ket.

        E has legs (bra_chi, ket_chi).  Host numpy: this is the oracle /
        validation contraction path (finite two-point functions, overlaps),
        which must handle complex tensors on complex-incapable backends and
        is dominated by per-pair dispatch overhead on device anyway."""
        Tb = np.asarray(Tb)
        Tk = np.asarray(Tk)
        if op is not None:
            Tk = np.einsum("mn,anb->amb", np.asarray(op).astype(Tk.dtype), Tk)
        tmp = np.einsum("ab,bnc->anc", E, Tk)
        return np.einsum("and,anc->dc", Tb.conj(), tmp)

    def overlap(self, other: "MPS") -> complex:
        """<self|other> for finite MPS of equal length."""
        assert self.finite and other.finite and self.L == other.L
        Gb = [np.asarray(t) for t in self.exact_tensors()]
        Gk = [np.asarray(t) for t in other.exact_tensors()]
        E = np.ones((1, 1), dtype=Gk[0].dtype)
        for Tb, Tk in zip(Gb, Gk):
            E = self._env_update(E, Tb, Tk)
        return complex(E[0, 0])

    def to_statevector(self) -> np.ndarray:
        """Dense state vector (first site is the most significant index);
        for small finite systems (tests/oracles)."""
        assert self.finite
        G = [np.asarray(t) for t in self.exact_tensors()]
        psi = np.ones((1, 1), dtype=G[0].dtype)  # (phys_so_far, chi)
        for T in G:
            psi = np.einsum("pa,anb->pnb", psi, T)
            psi = psi.reshape(psi.shape[0] * psi.shape[1], psi.shape[2])
        return psi[:, 0]

    def norm_squared(self) -> float:
        return float(np.real(self.overlap(self)))

    def expectation_value(self, op_name: str, sites=None) -> np.ndarray:
        """Per-site expectation values <op_i> (finite and infinite MPS;
        the reference obtains these from TeNPy ``MPS.expectation_value``)."""
        if not self.finite:
            return self._expectation_value_infinite(op_name, sites)
        G = [np.asarray(t) for t in self.exact_tensors()]
        if sites is None:
            sites = range(self.L)
        # left and right plain environments
        Ls = [np.ones((1, 1), dtype=G[0].dtype)]
        for T in G:
            Ls.append(self._env_update(Ls[-1], T, T))
        Rs = [np.ones((1, 1), dtype=G[0].dtype)]
        for T in reversed(G):
            Rs.append(
                np.einsum("anb,dnc,bc->ad", T.conj(), T, Rs[-1]).conj().T.conj()
            )
        Rs = Rs[::-1]
        out = []
        for i in sites:
            op = self.sites[i].get_op(op_name)
            Ti = G[i]
            E = self._env_update(Ls[i], Ti, Ti, op=op)
            out.append(complex(np.einsum("ab,ab->", E, Rs[i + 1].conj())))
        vals = np.asarray(out)
        return vals

    def _expectation_value_infinite(self, op_name: str, sites=None):
        """<op_i> of an infinite MPS in canonical form: contract diag(S_i^2)
        against the right-canonical tensor with the operator inserted."""
        if sites is None:
            sites = range(self.L)
        out = []
        for i in sites:
            i = i % self.L
            B = np.asarray(self.get_B(i, "B"))
            S2 = np.asarray(self._S[i]) ** 2
            op = np.asarray(self.sites[i].get_op(op_name))
            val = np.einsum("a,anb,nm,amb->", S2, B.conj(), op, B)
            out.append(complex(val))
        return np.asarray(out)

    def correlation_function_infinite(
        self, name1: str, name2: str, max_range: int, sites1=None
    ) -> np.ndarray:
        r"""Two-point functions <op1_i op2_{i+r}> of an infinite MPS for
        r = 1..max_range, i in ``sites1`` (default: the unit cell).

        Returns an array of shape (len(sites1), max_range); Jordan-Wigner
        strings are threaded exactly as in :meth:`correlation_function`
        (mixed fermionic/bosonic pairs raise).  Replaces the reference's use
        of TeNPy ``MPS.correlation_function`` on infinite states.
        """
        assert not self.finite
        L = self.L
        if sites1 is None:
            sites1 = range(L)
        jw1 = self.sites[0].op_needs_JW.get(name1, False)
        jw2 = self.sites[0].op_needs_JW.get(name2, False)
        if jw1 != jw2:
            raise ValueError(
                f"correlation_function_infinite({name1!r}, {name2!r}): "
                "mismatched Jordan-Wigner requirements (parity-odd pair)"
            )
        needs_jw = jw1 and jw2

        out = np.zeros((len(sites1), max_range), dtype=complex)
        for k, i in enumerate(sites1):
            i = i % L
            site_i = self.sites[i]
            op1 = np.asarray(site_i.get_op(name1))
            if needs_jw:
                op1 = op1 @ np.asarray(site_i.get_op("JW"))
            B = np.asarray(self.get_B(i, "B"))
            S2 = np.asarray(self._S[i]) ** 2
            # E[a, b] environment between bra/ket after op1 at site i
            E = np.einsum("a,anb,nm,amc->bc", S2, B.conj(), op1, B)
            for r in range(1, max_range + 1):
                j = (i + r) % L
                site_j = self.sites[j]
                Bj = np.asarray(self.get_B(j, "B"))
                op2 = np.asarray(site_j.get_op(name2))
                val = np.einsum("bc,bnd,nm,cmd->", E, Bj.conj(), op2, Bj)
                out[k, r - 1] = complex(val)
                string = (
                    np.asarray(site_j.get_op("JW")) if needs_jw else None
                )
                E = np.einsum(
                    "bc,bnd,nm,cme->de", E, Bj.conj(),
                    string if string is not None else np.eye(site_j.d), Bj,
                )
        return out

    def correlation_function(
        self, name1: str, name2: str, sites1=None, sites2=None
    ) -> np.ndarray:
        r"""Two-point functions  result[k, l] = <op1_{sites1[k]} op2_{sites2[l]}>,
        threading Jordan-Wigner strings automatically for fermionic
        operators, matching the reference's use of TeNPy
        ``MPS.correlation_function`` (examples/slater.py:31-36).

        Finite MPS default: all L x L pairs.  Infinite MPS: arbitrary site
        pairs — indices may exceed the unit cell (site i lives in copy
        ``i // L`` of the cell); defaults to the unit cell on both axes
        (TeNPy ``MPS.correlation_function`` surface on infinite states).
        """
        if not self.finite:
            return self._correlation_function_infinite_pairs(
                name1, name2, sites1, sites2
            )
        assert self.finite
        L = self.L
        G = [np.asarray(t) for t in self.exact_tensors()]
        dtype = G[0].dtype

        # plain environments
        Ls = [np.ones((1, 1), dtype=dtype)]
        for T in G:
            Ls.append(self._env_update(Ls[-1], T, T))
        Rs = [None] * (L + 1)
        Rs[L] = np.ones((1, 1), dtype=dtype)
        for i in reversed(range(L)):
            T = G[i]
            Rs[i] = np.einsum("anb,cnd,bd->ac", T.conj(), T, Rs[i + 1])

        def close(E, i):
            return complex(np.einsum("ab,ab->", E, Rs[i]))

        result = np.zeros((L, L), dtype=complex)
        needs_jw = []
        for i in range(L):
            jw1 = self.sites[i].op_needs_JW.get(name1, False)
            jw2 = self.sites[i].op_needs_JW.get(name2, False)
            if jw1 != jw2:
                # a mixed fermionic/bosonic pair is parity-odd: its string
                # structure is ill-defined for a two-point function, and
                # silently omitting the string would produce wrong signs
                raise ValueError(
                    f"correlation_function({name1!r}, {name2!r}): operators "
                    "have mismatched Jordan-Wigner requirements (parity-odd "
                    "pair); such correlators are not supported"
                )
            needs_jw.append(jw1 and jw2)

        for i in range(L):
            site_i = self.sites[i]
            op1 = site_i.get_op(name1)
            op2 = site_i.get_op(name2)
            # diagonal: on-site product op1 @ op2
            E = self._env_update(Ls[i], G[i], G[i], op=op1 @ op2)
            result[i, i] = close(E, i + 1)

            # i < j: (op1 @ JW)_i, JW strings, op2_j
            opi = op1 @ site_i.get_op("JW") if needs_jw[i] else op1
            E = self._env_update(Ls[i], G[i], G[i], op=opi)
            for j in range(i + 1, L):
                site_j = self.sites[j]
                result[i, j] = close(
                    self._env_update(E, G[j], G[j], op=site_j.get_op(name2)), j + 1
                )
                if j < L - 1:
                    string = site_j.get_op("JW") if needs_jw[i] else None
                    E = self._env_update(E, G[j], G[j], op=string)

            # i > j: (JW @ op2)_j, JW strings, op1_i   (here the loop variable
            # i plays the role of j in result[*, j])
            opj = site_i.get_op("JW") @ op2 if needs_jw[i] else op2
            E = self._env_update(Ls[i], G[i], G[i], op=opj)
            for k in range(i + 1, L):
                site_k = self.sites[k]
                result[k, i] = close(
                    self._env_update(E, G[k], G[k], op=site_k.get_op(name1)), k + 1
                )
                if k < L - 1:
                    string = site_k.get_op("JW") if needs_jw[i] else None
                    E = self._env_update(E, G[k], G[k], op=string)
        if sites1 is not None or sites2 is not None:
            s1 = np.asarray(list(sites1 if sites1 is not None else range(L)))
            s2 = np.asarray(list(sites2 if sites2 is not None else range(L)))
            return result[np.ix_(s1, s2)]
        return result

    def _correlation_function_infinite_pairs(
        self, name1: str, name2: str, sites1=None, sites2=None
    ) -> np.ndarray:
        """<op1_i op2_j> for arbitrary site pairs of an infinite MPS in
        canonical form; site indices beyond the unit cell address its
        translated copies.  JW strings thread exactly as in the finite
        :meth:`correlation_function` (mixed fermionic/bosonic pairs raise).
        """
        L = self.L
        if sites1 is None:
            sites1 = range(L)
        if sites2 is None:
            sites2 = range(L)
        sites1 = list(sites1)
        sites2 = list(sites2)
        jw1 = self.sites[0].op_needs_JW.get(name1, False)
        jw2 = self.sites[0].op_needs_JW.get(name2, False)
        if jw1 != jw2:
            raise ValueError(
                f"correlation_function({name1!r}, {name2!r}): operators "
                "have mismatched Jordan-Wigner requirements (parity-odd "
                "pair); such correlators are not supported"
            )
        needs_jw = jw1 and jw2

        def B_of(i):
            return np.asarray(self.get_B(i % L, "B"))

        def op_of(i, name):
            return np.asarray(self.sites[i % L].get_op(name))

        def pair_value(i, j):
            # orient so the left operator acts first; the lower triangle
            # uses (JW @ op2)_j ... op1_i, mirroring the finite path
            if i == j:
                B = B_of(i)
                S2 = np.asarray(self._S[i % L]) ** 2
                op = op_of(i, name1) @ op_of(i, name2)
                return complex(np.einsum("a,anb,nm,amb->", S2, B.conj(), op, B))
            if i < j:
                a, b = i, j
                op_left = op_of(i, name1)
                if needs_jw:
                    op_left = op_left @ op_of(i, "JW")
                op_right = op_of(j, name2)
            else:
                a, b = j, i
                op_left = op_of(j, name2)
                if needs_jw:
                    op_left = op_of(j, "JW") @ op_left
                op_right = op_of(i, name1)
            Ba = B_of(a)
            S2 = np.asarray(self._S[a % L]) ** 2
            E = np.einsum("a,anb,nm,amc->bc", S2, Ba.conj(), op_left, Ba)
            for k in range(a + 1, b):
                Bk = B_of(k)
                if needs_jw:
                    E = np.einsum(
                        "bc,bnd,nm,cme->de", E, Bk.conj(), op_of(k, "JW"), Bk
                    )
                else:
                    E = np.einsum("bc,bnd,cne->de", E, Bk.conj(), Bk)
            Bb = B_of(b)
            return complex(
                np.einsum("bc,bnd,nm,cmd->", E, Bb.conj(), op_right, Bb)
            )

        out = np.zeros((len(sites1), len(sites2)), dtype=complex)
        for k, i in enumerate(sites1):
            for l, j in enumerate(sites2):
                out[k, l] = pair_value(int(i), int(j))
        return out

    # ------------------------------------------------------------------
    # entanglement
    # ------------------------------------------------------------------
    def entanglement_spectrum(self, by_charge: bool = False):
        """Per-bond entanglement spectrum -2 log S (TeNPy-compatible shape).

        With ``by_charge``, returns per bond a list of (charge, spectrum)
        pairs grouped by the bond charge labels.
        """
        bonds = range(1, self.L) if self.finite else range(self.L)
        out = []
        for i in bonds:
            S = self._S[i]
            if not by_charge:
                out.append(-2 * np.log(S))
            else:
                groups = []
                for q, idx in sectors_of(self.q_bond[i]).items():
                    groups.append(((q,), -2 * np.log(S[idx])))
                out.append(groups)
        return out

    def entanglement_entropy(self) -> np.ndarray:
        bonds = range(1, self.L) if self.finite else range(self.L)
        out = []
        for i in bonds:
            S2 = self._S[i] ** 2
            S2 = S2[S2 > 1e-30]
            out.append(float(-np.sum(S2 * np.log(S2))))
        return np.asarray(out)

    # ------------------------------------------------------------------
    # canonicalisation
    # ------------------------------------------------------------------
    def canonical_form_finite(self, cutoff: float = 1e-12, chi_max: int | None = None):
        """Brings a finite MPS into canonical form (right-canonical 'B' with
        Schmidt values on every bond), truncating Schmidt values below
        ``cutoff`` (relative).  Replaces TeNPy ``canonical_form_finite`` used
        after Gutzwiller projection (reference gutzwiller.py:467-470).
        """
        with self.device_context():
            return self._canonical_form_finite(cutoff, chi_max)

    def _canonical_form_finite(self, cutoff, chi_max):
        assert self.finite
        L = self.L
        chinfo = self.chinfo
        # exact state tensors (any starting form); if forms unknown, the raw
        # tensors are taken as-is (used by gutzwiller, which invalidates form)
        try:
            G = self.exact_tensors()
        except (AssertionError, ValueError):
            G = list(self._B)

        # ---- left-to-right QR sweep: make everything left-canonical ----
        # host tensors run the whole sweep in numpy: the many tiny ops of a
        # canonical sweep are dispatch-bound as jax eager ops (~0.4 ms each
        # in an accelerator process)
        xp = np if isinstance(G[0], np.ndarray) else jnp

        # MESH-RESIDENT sweep: under an active mesh, every stored tensor of
        # the sweep keeps its bond axis sharded over the devices, so the
        # chain's residency stays ~1/N per device throughout (the north-star
        # memory wall, BASELINE.md round 4: the sweep's working set is ONE
        # site's matrix, but the CHAIN must never materialise replicated).
        # The per-sector factorizations are unchanged — charged blocks are
        # independent — so the result is bit-identical to the unsharded
        # device sweep.
        if xp is jnp:
            from ..parallel.mesh import bond_shard_put as _shard
            from ..parallel.mesh import gather_replicated as _gather
        else:
            def _shard(t):
                return t

            def _gather(t):
                return t
        qt = self.qtotal.copy()
        carry = xp.ones((1, 1), dtype=G[0].dtype)
        q_carry = self.q_bond[0].copy()
        A_list, q_bonds = [], [self.q_bond[0].copy()]
        for i in range(L):
            d = self.sites[i].d
            # gather ONE site (the working set); the chain stays sharded
            T = xp.einsum("ab,bnc->anc", carry, _gather(G[i]))
            G[i] = None  # release the local ref as the sweep passes
            chiL, _, chiR = T.shape
            M = T.reshape(chiL * d, chiR)
            q_row = (q_carry[:, None] + self.sites[i].charges[None, :]).reshape(-1)
            Q, R, q_mid = charged_qr(
                M, q_row, self.q_bond[i + 1], chinfo, qtotal=int(qt[i])
            )
            A_list.append(_shard(Q.reshape(chiL, d, Q.shape[1])))
            carry = R
            q_carry = chinfo.make_valid(np.asarray(q_mid) + qt[i])
            q_bonds.append(q_carry.copy())
            qt[i] = 0  # charge absorbed into bond labels
        # trailing R is 1x1 (norm * phase)
        tail = carry
        norm = float(xp.abs(tail[0, 0])) if tail.size == 1 else float(
            xp.linalg.norm(tail)
        )
        phase = tail / norm

        # absorb the phase and norm into the last tensor for the next sweep
        A_list[-1] = _shard(
            xp.einsum("anb,bc->anc", _gather(A_list[-1]), phase)
        )

        # ---- right-to-left SVD sweep: truncate, collect Schmidt values ----
        B_list = [None] * L
        S_list = [None] * (L + 1)
        S_list[L] = np.ones(1)
        # the tail bond is 1-dimensional after the QR sweep; keep its label
        q_bonds[L] = (
            q_bonds[L][:1] if len(q_bonds[L]) else np.zeros(1, np.int64)
        )
        carry = None
        for i in reversed(range(L)):
            T = _gather(A_list[i])
            A_list[i] = None  # progressive release: bounds the A+B overlap
            if carry is not None:
                T = xp.einsum("anb,bc->anc", T, carry)
            chiL, d, chiR = T.shape
            M = T.reshape(chiL, d * chiR)
            q_col = (
                q_bonds[i + 1][None, :] - 0
            )  # placeholder; recompute below properly
            # column charge labels: q_bond[i+1][c] - q_phys[n] in left-charge
            # convention (the physical charge moves from row to column side)
            q_col = (
                np.repeat(self.sites[i].charges[:, None], chiR, axis=1) * 0
                + q_bonds[i + 1][None, :]
                - self.sites[i].charges[:, None]
            ).reshape(-1)
            U, S, Vh, q_mid, _err = charged_svd(
                M,
                q_bonds[i],
                q_col,
                chinfo,
                qtotal=0,
                cutoff=cutoff,
                chi_max=chi_max,
                normalize=True,
            )
            B_list[i] = _shard(Vh.reshape(Vh.shape[0], d, chiR))
            S_list[i] = S
            q_bonds[i] = chinfo.make_valid(np.asarray(q_mid))
            carry = U * xp.asarray(S)[None, :]
        # leftmost carry is 1x1 phase; absorb into first tensor
        B_list[0] = _shard(
            xp.einsum("ab,bnc->anc", carry, _gather(B_list[0]))
        )
        S_list[0] = np.ones(1)

        self._B = B_list
        self._S = S_list
        self.form = ["B"] * L
        self.q_bond = q_bonds
        self.qtotal = qt
        self.norm = norm
        return self

    def canonical_form_infinite(self, cutoff: float = 1e-10, tol: float = 1e-13, max_iter: int = 5000):
        """Brings an infinite MPS into right-canonical form via the fixed
        points of the unit-cell transfer matrix (Orus-Vidal style), replacing
        TeNPy's ``canonical_form_infinite1`` (reference gutzwiller.py:473).

        Steps: (1) dominant left/right fixed points rho_L = Y^H Y,
        rho_R = X X^H of the cell transfer matrix (power iteration);
        (2) boundary gauge B_cell = V^H X^+ (cell) X V with
        U S V^H = svd(Y X), making the cell right-canonical as a whole with
        left fixed point diag(S^2); (3) interior bonds: sweep the left
        environment  rho <- T_i^H rho T_i  and diagonalise it at every bond
        (unitary bond rotations preserve right-canonicality), which yields
        the Schmidt values.  Bond-charge labels are propagated: the cell
        transfer map preserves the charge block structure, so the fixed
        points are masked to their charge-diagonal blocks and every gauge
        factorization (eigh of the fixed points, the Y X SVD, the LQ sweep,
        the interior diagonalisations) runs sector by sector — matching the
        reference's use of TeNPy canonical_form_infinite1, which keeps
        quantum numbers (gutzwiller.py:473).
        """
        with self.device_context():
            return self._canonical_form_infinite(cutoff, tol, max_iter)

    def _canonical_form_infinite(self, cutoff, tol, max_iter):
        assert not self.finite
        L = self.L
        # host tensors run the whole pass in numpy (the transfer-matrix
        # power iteration and gauge sweeps are many small dispatch-bound ops)
        host = isinstance(self._B[0], np.ndarray)
        xp = np if host else jnp
        T = [xp.asarray(Ti) for Ti in self._B]
        chi = T[0].shape[0]
        dtype = T[0].dtype

        def _eigh_local(A):
            if host:
                return np.linalg.eigh(np.asarray(A))
            return robust_eigh(A)

        def _svd_local(A):
            if host:
                return np.linalg.svd(np.asarray(A), full_matrices=False)
            return robust_svd(A, full_matrices=False)

        def _qr_local(A):
            if host:
                return np.linalg.qr(np.asarray(A), mode="reduced")
            return robust_qr(A)

        # charge propagation: the cell transfer map preserves the bond-charge
        # block structure, so every gauge factorization can run sector by
        # sector and the output keeps its quantum numbers (the reference
        # keeps them through TeNPy's canonical_form_infinite1,
        # gutzwiller.py:473).  Requires consistent wrap labels.
        chinfo = self.chinfo
        qt = self.qtotal.copy()
        # the wrap bond may carry a constant per-cell charge drift delta
        # (q_bond[L] = q_bond[0] + delta elementwise, e.g. the Sz background
        # of a polarised or offset unit cell); the index partition is then
        # identical on both wrap labels, which is all the block structure
        # needs — delta only re-enters when assigning true label values.
        delta = 0
        charged = (
            len(self.q_bond[L]) == len(self.q_bond[0])
            and any(np.any(np.asarray(q) != 0) for q in self.q_bond)
        )
        if charged:
            dq = np.asarray(self.q_bond[L], np.int64) - np.asarray(
                self.q_bond[0], np.int64
            )
            if dq.size and np.all(dq == dq[0]):
                delta = int(dq[0])
            else:
                charged = False
        q0_cur = np.asarray(self.q_bond[0]).copy()

        def tm_right(X):
            for Ti in reversed(T):
                X = xp.einsum("anb,cnd,bd->ac", Ti, Ti.conj(), X)
            return X

        def tm_left(X):
            for Ti in T:
                X = xp.einsum("ab,anc,bnd->cd", X, Ti, Ti.conj())
            return X

        def dominant(fn):
            """Dominant PSD fixed point of the (completely positive) cell
            transfer map.

            Power iteration first; if the dominant eigenvalue is (near-)
            degenerate or accompanied by equal-magnitude rotating eigenvalues
            (non-injective MPS, e.g. Gutzwiller-projected states that split
            into superselection sectors), fall back to an Arnoldi solve of
            the top eigenspace and assemble the maximal PSD fixed point as
            the positive part of the summed real-eigenvalue candidates."""
            X = xp.eye(chi, dtype=dtype)
            lam = 1.0
            for _ in range(min(max_iter, 500)):
                Y = fn(X)
                Y = (Y + Y.conj().T) / 2
                lam = float(xp.linalg.norm(Y))
                Y = Y / lam
                if float(xp.linalg.norm(Y - X)) < tol:
                    return Y, lam
                X = Y

            import scipy.sparse.linalg as spla

            def mv(x):
                Xm = xp.asarray(x.reshape(chi, chi))
                return np.asarray(fn(Xm)).ravel()

            n2 = chi * chi
            op = spla.LinearOperator((n2, n2), matvec=mv, dtype=complex)
            k = min(6, n2 - 2)
            try:
                w, Vv = spla.eigs(op, k=k, which="LM", tol=1e-12, maxiter=5000)
            except Exception as err:  # ARPACK failure: keep power-iter result
                logger.warning("transfer-matrix Arnoldi failed (%s)", err)
                return X, lam
            lam = float(np.abs(w).max())
            rho = np.zeros((chi, chi), dtype=complex)
            for i in range(len(w)):
                # real positive eigenvalues at the top of the spectrum
                if abs(w[i].imag) < 1e-8 * lam and w[i].real > lam * (1 - 1e-6):
                    Hm = Vv[:, i].reshape(chi, chi)
                    Hm = (Hm + Hm.conj().T) / 2
                    if np.trace(Hm).real < 0:
                        Hm = -Hm
                    rho += Hm
            if np.linalg.norm(rho) == 0:  # should not happen for a CP map
                logger.warning("no positive dominant fixed point found")
                return X, lam
            e_r, U_r = np.linalg.eigh(rho)
            e_r = np.clip(e_r, 0.0, None)
            rho = (U_r * e_r) @ U_r.conj().T
            rho /= np.linalg.norm(rho)
            if not np.issubdtype(np.dtype(dtype), np.complexfloating):
                rho = rho.real
            return xp.asarray(rho.astype(dtype)), lam

        # The gauge pass may need iterating: when the MPS is reducible (e.g.
        # Gutzwiller-projected states with superselection sectors), the SVD
        # of Y X is rank-deficient and one pass only projects onto the common
        # invariant support; repeating on the reduced cell converges.
        S_host = None
        q_mid = q0_cur
        for _pass in range(4):
            chi = T[0].shape[0]
            rho_R, lam = dominant(tm_right)
            rho_L, _ = dominant(tm_left)
            if charged:
                # exact for a charge-conserving MPS: fixed points are block
                # diagonal; masking removes cross-sector power-iteration
                # residue (which does not decay for superselection sectors)
                mask = xp.asarray(
                    chinfo.equal(q0_cur[:, None], q0_cur[None, :])
                )
                rho_R = xp.where(mask, rho_R, 0.0)
                rho_L = xp.where(mask, rho_L, 0.0)

            # normalise so the cell transfer matrix has dominant eigenvalue 1
            scale = lam ** (-0.5 / L)
            T = [Ti * scale for Ti in T]

            # factor the fixed points with spectral clipping
            if charged:
                eR_h, UR_h, qR_cols = charged_eigh(rho_R, q0_cur, chinfo)
                UR = xp.asarray(UR_h)
                eR = xp.asarray(eR_h)
            else:
                eR, UR = _eigh_local(rho_R)
                eR_h = np.asarray(eR)
            keepR = eR_h > max(cutoff * eR_h.max(), 0.0)
            X = UR[:, keepR] * xp.sqrt(eR[keepR])[None, :]  # (chi, kR)
            Xp = (1.0 / xp.sqrt(eR[keepR]))[:, None] * UR[:, keepR].conj().T

            if charged:
                eL_h, UL_h, qL_cols = charged_eigh(rho_L, q0_cur, chinfo)
                UL = xp.asarray(UL_h)
                eL = xp.asarray(eL_h)
            else:
                eL, UL = _eigh_local(rho_L)
                eL_h = np.asarray(eL)
            keepL = eL_h > max(cutoff * eL_h.max(), 0.0)
            Y = (UL[:, keepL] * xp.sqrt(eL[keepL])[None, :]).conj().T  # (kL, chi)

            if charged:
                qX = qR_cols[keepR]
                qY = qL_cols[keepL]
                _U, S_host, Vh_, q_mid, _err = charged_svd(
                    Y @ X, qY, qX, chinfo, qtotal=0, cutoff=cutoff,
                    normalize=True,
                )
                r = len(S_host)
                V = Vh_.conj().T  # (kR, r), columns labelled q_mid
            else:
                U, S, Vh = _svd_local(Y @ X)
                S_host = np.asarray(S)
                keep = S_host > cutoff * S_host.max()
                r = int(keep.sum())
                S_host = S_host[:r]
                S_host = S_host / np.linalg.norm(S_host)
                V = Vh[:r, :].conj().T  # (kR, r)

            # boundary gauge: bond0' = V^H X^+ . bond0 ;  bondL' = bondL . X V
            T[0] = xp.einsum("ra,anb->rnb", V.conj().T @ Xp, T[0])
            T[-1] = xp.einsum("anb,br->anr", T[-1], X @ V)
            if charged:
                q0_cur = chinfo.make_valid(np.asarray(q_mid))

            # converged when the whole cell is right-canonical
            E = xp.eye(T[-1].shape[2], dtype=dtype)
            E = tm_right(E)
            resid = float(xp.abs(E - xp.eye(E.shape[0], dtype=dtype)).max())
            if resid < 1e-9:
                break
        else:
            logger.warning(
                "canonical_form_infinite: boundary gauge residual %.2e after "
                "4 passes (reducible MPS?)", resid,
            )

        # right-to-left LQ sweep: make each interior tensor individually
        # right-canonical (the whole cell already is, so T[0] ends up
        # right-canonical automatically)
        q_cur = (
            [q0_cur]
            + [np.asarray(self.q_bond[i]).copy() for i in range(1, L)]
            + [q0_cur + delta]
        )
        for i in reversed(range(1, L)):
            a, d, b = T[i].shape
            M = T[i].reshape(a, d * b)
            if charged:
                qp = np.asarray(self.sites[i].charges, np.int64)
                q_colM = chinfo.make_valid(
                    (q_cur[i + 1][None, :] - qp[:, None] + qt[i]).reshape(-1)
                )
                Q_t, R_t, q_mid_i = charged_qr(
                    M.conj().T, q_colM, q_cur[i], chinfo, qtotal=0
                )
                q_cur[i] = chinfo.make_valid(np.asarray(q_mid_i))
            else:
                Q_t, R_t = _qr_local(M.conj().T)  # M = R^H Q^H
            T[i] = Q_t.conj().T.reshape(-1, d, b)
            T[i - 1] = xp.einsum("anb,bc->anc", T[i - 1], R_t.conj().T)

        # interior sweep: diagonalise the left environment at every bond
        S_list = [None] * (L + 1)
        S_list[0] = S_list[L] = S_host
        rho = xp.asarray(np.diag(S_host**2)).astype(dtype)
        for i in range(L - 1):
            rho = xp.einsum("ab,anc,bnd->cd", rho, T[i], T[i].conj())
            rho = (rho + rho.conj().T) / 2
            if charged:
                e_h2, W_h, qW = charged_eigh(rho, q_cur[i + 1], chinfo)
                e_h = np.clip(e_h2, 0.0, None)
                # (charge asc, value desc) ordering, matching charged_svd
                order_h = np.lexsort((-e_h, qW))
                W = xp.asarray(W_h)[:, xp.asarray(order_h)]
                e_h = e_h[order_h]
                q_cur[i + 1] = qW[order_h]
            else:
                e, W = _eigh_local(rho)
                e_h = np.clip(np.asarray(e), 0.0, None)
                # descending order for conventional Schmidt ordering
                order = xp.asarray(np.argsort(e_h)[::-1].copy())
                W = W[:, order]
                e_h = e_h[np.asarray(order)]
            T[i] = xp.einsum("anb,bc->anc", T[i], W)
            T[i + 1] = xp.einsum("ba,bnc->anc", W.conj(), T[i + 1])
            s = np.sqrt(e_h)
            nrm = np.linalg.norm(s)
            S_list[i + 1] = s / (nrm if nrm > 0 else 1.0)
            rho = xp.asarray(np.diag(e_h)).astype(dtype)

        self._B = T
        self._S = S_list
        self.form = ["B"] * L
        if charged:
            self.q_bond = [np.asarray(q).copy() for q in q_cur]
            self.qtotal = qt
        else:
            self.q_bond = [np.zeros(Ti.shape[0], np.int64) for Ti in T] + [
                np.zeros(T[-1].shape[2], np.int64)
            ]
            self.qtotal = np.zeros(L, np.int64)
        return self

    def __repr__(self):
        chis = [self.chi(i) for i in range(self.L + 1)]
        return (
            f"MPS(L={self.L}, bc={self.bc!r}, chi_max={max(chis)}, "
            f"chinfo={self.chinfo}, forms={''.join(str(f)[0] for f in self.form)})"
        )
