"""Cross-validation of the device Pfaffian kernel against the native C++
implementation (the pfapack-equivalent host path)."""

import numpy as np
import jax.numpy as jnp

from temfpy_tpu.ops.native import have_native, pfaffian_batch
from temfpy_tpu.ops.pfaffian import batched_pfaffian


def test_native_vs_device():
    rng = np.random.default_rng(1)
    for n in (2, 6, 12):
        A = rng.normal(size=(9, n, n)) + 1j * rng.normal(size=(9, n, n))
        A = A - A.swapaxes(-1, -2)
        host = pfaffian_batch(A)
        dev = np.asarray(batched_pfaffian(jnp.asarray(A)))
        np.testing.assert_allclose(dev, host, rtol=1e-9, atol=1e-11)


def test_native_real():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(4, 10, 10))
    A = A - A.swapaxes(-1, -2)
    host = pfaffian_batch(A)
    dev = np.asarray(batched_pfaffian(jnp.asarray(A)))
    np.testing.assert_allclose(dev, host, rtol=1e-9, atol=1e-11)
    # det = Pf^2
    np.testing.assert_allclose(host**2, np.linalg.det(A), rtol=1e-8)


def test_build_available():
    # the CI image ships g++, so the native path should actually build
    assert have_native()
