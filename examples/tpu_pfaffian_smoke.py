"""TPU smoke test for the Pfaffian (BdG) conversion path.

Runs a small Kitaev chain H -> MPS conversion and validates the result
against the input correlation matrix.  On TPU backends the pipeline runs in
split-complex mode automatically (complex data never touches the device;
the basis-change matmuls, the U-block inverse and the Pfaffian fill execute
as (re, im) f64-plane kernels — see temfpy_tpu.ops.splitc), so the same f64
precision and cutoffs apply on every backend.

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

    from temfpy_tpu.config import complex_on_device

    mode = "device-complex" if complex_on_device() else "split-complex (re/im planes)"
    print(f"complex mode: {mode}", flush=True)
    svd_min = 1e-6
    t0 = time.perf_counter()
    psi = pfaffian.C_to_MPS(C, {"chi_max": 128, "svd_min": svd_min}, basis="M")
    t1 = time.perf_counter()
    print(f"C_to_MPS (L={L}): {t1 - t0:.2f}s", flush=True)

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
    # deviation is truncation-limited (empirically ~0.1 * svd_min)
    tol = 10 * svd_min
    status = "PASS" if max(dev_n, dev_c) < tol else "FAIL"
    print(f"pfaffian TPU smoke: {status}", flush=True)


if __name__ == "__main__":
    main()
