"""TPU smoke test for the Pfaffian (BdG) conversion path.

Runs a small Kitaev chain H -> MPS conversion in complex64 (the TPU XLA
stack cannot compile complex128 matmuls) and validates the result against
the CPU/f64 ground truth via correlation-function reconstruction.

Usage (on the axon TPU):
    PYTHONPATH=/root/.axon_site:/root/repo python examples/tpu_pfaffian_smoke.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

import temfpy_tpu
from temfpy_tpu import pfaffian


def kitaev_chain(L, t=1.0, delta=1.0, mu=0.5):
    """BdG Hamiltonian of an open Kitaev chain in the complex-fermion basis
    (interleaved c^dag/c per site)."""
    H = np.zeros((2 * L, 2 * L), complex)
    for i in range(L):
        H[2 * i, 2 * i] = -mu / 2
        H[2 * i + 1, 2 * i + 1] = mu / 2
    for i in range(L - 1):
        # hopping -t c^dag_i c_{i+1} + h.c.
        H[2 * i, 2 * (i + 1)] += -t / 2
        H[2 * (i + 1), 2 * i] += -t / 2
        H[2 * i + 1, 2 * (i + 1) + 1] += t / 2
        H[2 * (i + 1) + 1, 2 * i + 1] += t / 2
        # pairing delta c_i c_{i+1} + h.c.
        H[2 * i, 2 * (i + 1) + 1] += delta / 2
        H[2 * (i + 1) + 1, 2 * i] += delta / 2
        H[2 * i + 1, 2 * (i + 1)] += -delta / 2
        H[2 * (i + 1), 2 * i + 1] += -delta / 2
    return H + H.conj().T - np.diag(np.diag(H).real)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    L = 16
    H = kitaev_chain(L, mu=3.0)  # trivial phase: gapped, no Majorana zero mode
    C = pfaffian.correlation_matrix(H, basis="C->M")

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        # probe complex support: on the current axon v5e runtime, complex64
        # executes simple ops but real()/astype/transfer paths raise
        # UNIMPLEMENTED, and complex128 device_put blocks forever — the
        # Pfaffian pipeline needs host LAPACK + split-complex device kernels
        # (round-2 work) before it can run end-to-end on this TPU
        try:
            np.asarray(jnp.asarray(np.ones(2, np.complex64)).real)
        except Exception as err:
            print(f"complex64 transfer probe failed: {err!r}"[:120], flush=True)
            print("pfaffian TPU smoke: SKIP (platform complex support "
                  "unimplemented; CPU path is fully functional)", flush=True)
            return
    dtype = jnp.complex64 if on_tpu else None
    # single precision can't resolve Schmidt values below ~1e-6; cutoffs much
    # below 1e-6 (lambda ~ 1e-12) approach eigh noise in classification
    svd_min = 1e-5 if on_tpu else 1e-6
    t0 = time.perf_counter()
    psi = pfaffian.C_to_MPS(C, {"chi_max": 128, "svd_min": svd_min}, basis="M",
                            dtype=dtype)
    t1 = time.perf_counter()
    print(f"C_to_MPS (L={L}, dtype={dtype}): {t1 - t0:.2f}s", flush=True)

    # reconstruct <c^dag_i c_j> from the MPS and compare with C
    C_C = np.asarray(pfaffian.matrix_M2C(C))
    nexp = psi.expectation_value("N")
    n_ref = np.array([C_C[2 * i, 2 * i].real for i in range(L)])
    dev_n = float(np.max(np.abs(np.asarray(nexp) - n_ref)))

    corr = np.asarray(psi.correlation_function("Cd", "C"))[0, 1:]
    corr_ref = np.array([C_C[0, 2 * j] for j in range(1, L)])
    dev_c = float(np.max(np.abs(corr - corr_ref)))

    print(f"max |<n_i> - ref| = {dev_n:.3e}", flush=True)
    print(f"max |<cd_0 c_j> - ref| = {dev_c:.3e}", flush=True)
    # deviation is truncation-limited (empirically ~0.1 * svd_min) in f64,
    # precision-limited in c64
    tol = 1e-3 if dtype == jnp.complex64 else 10 * svd_min
    status = "PASS" if max(dev_n, dev_c) < tol else "FAIL"
    print(f"pfaffian TPU smoke: {status}", flush=True)


if __name__ == "__main__":
    main()
