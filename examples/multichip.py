"""Mesh-sharded conversion: the production Slater -> MPS pipeline on a
jax.sharding.Mesh, with chi-sharded tensor fills.

The reference is a single-process CPU library (SURVEY.md §2.3); this
example is the TPU-native gap-fill: the all-cuts eigendecompositions shard
over the mesh "cuts" axis, the determinant pair batches over "pairs", and
above ``config.CHI_SHARD_MIN`` the fill's scatter targets shard their bond
axis so large-chi site tensors never materialise replicated per chip.

Runs on real multi-chip hardware or on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py
"""

import logging

import numpy as np

import jax

from temfpy_tpu import config, setup_logging, slater
from temfpy_tpu.parallel.mesh import make_mesh, use_mesh

setup_logging(logging.INFO)

W, Lx = 8, 6  # tight-binding cylinder: center-cut entanglement scales with W
L = W * Lx
H = np.zeros((L, L))


def idx(x, y):
    return x * W + y % W


for x in range(Lx):
    for y in range(W):
        H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
        if x + 1 < Lx:
            H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = -1.0

print(f"devices: {jax.devices()}")
config.CHI_SHARD_MIN = 64  # demo scale; production default is 2048

mps_ref = slater.H_to_MPS(H, {"chi_max": 128})
with use_mesh(make_mesh()):
    mps = slater.H_to_MPS(H, {"chi_max": 128})

dev = max(
    float(np.abs(np.asarray(a) - np.asarray(b)).max())
    for a, b in zip(mps_ref._B, mps._B)
)
print(f"max deviation vs single-device: {dev:.3e}")  # bit-identical

C, _ = slater.correlation_matrix(H)
err = np.abs(mps.correlation_function("Cd", "C").T - np.asarray(C)).max()
chi = max(len(np.asarray(s)) for s in mps._S)
print(f"max <Cd C> truncation error at chi={chi} (binding): {err:.3e}")
