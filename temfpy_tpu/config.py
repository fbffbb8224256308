"""Global numerical configuration for temfpy_tpu.

The library defaults to float64/complex128 (enabled via ``jax_enable_x64``)
because the algorithms certify fidelities of 1e-10 and better; the reference
library (``/root/reference/src/temfpy``) runs LAPACK in double precision
throughout.  On TPU, float64 is emulated by XLA; callers chasing speed over
the last digits can switch the working dtype to float32/complex64 with
:func:`set_dtype`.
"""

from __future__ import annotations

import os

import jax

# Enable x64 before any array is created.  This must run at import time of any
# temfpy_tpu module that touches jax.numpy.
if os.environ.get("TEMFPY_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: conversions use a small family of bucketed
# executables (batched eigh, det/Pfaffian batches, scatters) that are
# identical across runs; caching them makes cold starts cheap.
# NOT enabled for the CPU backend: XLA:CPU AOT reload is unreliable (machine
# feature autodetection mismatches on reload -> potential SIGILL).
_platforms = os.environ.get("JAX_PLATFORMS", "")
if (
    os.environ.get("TEMFPY_TPU_COMPILE_CACHE", "1") != "0"
    and _platforms not in ("cpu",)
):
    _cache_dir = os.environ.get(
        "TEMFPY_TPU_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/temfpy_tpu_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass

import jax.numpy as jnp  # noqa: E402  (after x64 flag)
import numpy as np  # noqa: E402

# Working dtypes (module-level, adjustable)
real_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
complex_dtype = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64

# Default tolerances, matching the reference defaults
# (schmidt_utils.py:14-15, testing.py:15, iMPS.py:16-18 in the reference).
DEFAULT_SVD_MIN = 1e-6
DEFAULT_DEG_TOL = 1e-12
DIAG_TOL = 1e-8
UNITARY_TOL = 1e-6
SCHMIDT_TOL = 1e-6
NUMERICAL_TOL = 1e-14


def complex_on_device() -> bool:
    """Whether complex dtypes are usable on the default jax backend.

    The axon TPU v5e runtime cannot ``device_put`` complex128 and raises
    UNIMPLEMENTED on most complex64 executables (BASELINE.md platform notes),
    so on TPU backends the library keeps complex data on the host and runs
    device compute in split-complex (re, im) f64 planes.  Override with
    ``TEMFPY_TPU_DEVICE_COMPLEX=0/1``.
    """
    mode = os.environ.get("TEMFPY_TPU_DEVICE_COMPLEX", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    return jax.default_backend() in ("cpu", "gpu")


def set_dtype(dtype) -> None:
    """Sets the working real dtype; the complex dtype follows."""
    global real_dtype, complex_dtype
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        real_dtype, complex_dtype = jnp.float64, jnp.complex128
    elif dtype == jnp.float32:
        real_dtype, complex_dtype = jnp.float32, jnp.complex64
    else:
        raise ValueError(f"Unsupported working dtype {dtype!r}")


def as_complex(x):
    """View/cast an array as the working complex dtype."""
    return jnp.asarray(x, dtype=complex_dtype)


def as_real(x):
    """View/cast an array as the working real dtype."""
    return jnp.asarray(x, dtype=real_dtype)


def np_real_dtype():
    return np.dtype(jnp.dtype(real_dtype).name)


def np_complex_dtype():
    return np.dtype(jnp.dtype(complex_dtype).name)
