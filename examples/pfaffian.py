"""Pfaffian/BdG state -> MPS: random Majorana Hamiltonian, verified via
<c^dag c> and anomalous <c c> correlators (mirrors reference
examples/pfaffian.py)."""

import logging

import numpy as np

from temfpy_tpu import pfaffian, setup_logging

setup_logging(logging.INFO)


def majorana_random_Hamiltonian(L, corr_range=3):
    x, y = np.meshgrid(np.arange(2 * L), np.arange(2 * L), indexing="ij")
    scale = np.exp(-abs(x - y) / corr_range)
    M = np.random.normal(size=(2 * L, 2 * L)) * scale
    return 1j * (M - M.T)


L = 20
chi = 200
H = majorana_random_Hamiltonian(L)

psi = pfaffian.H_to_MPS(H, {"chi_max": chi}, basis="M")

C = np.asarray(pfaffian.correlation_matrix(H, basis="M->C"))

CdC = psi.correlation_function("Cd", "C").T
dev = CdC - C[::2, ::2]
print(np.max(np.abs(dev)), np.linalg.norm(dev))

CC = psi.correlation_function("C", "C").T
dev = CC - C[::2, 1::2]
print(np.max(np.abs(dev)), np.linalg.norm(dev))
