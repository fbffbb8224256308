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
    # inside a small-problem CPU reroute (compute_context), complex data
    # lives on the XLA:CPU device, where complex dtypes work natively
    return jax.default_backend() in ("cpu", "gpu") or prefer_cpu_now()


def cpu_device():
    """The in-process XLA:CPU device, or None if unavailable."""
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


# Calibrated on the tunnel-attached v5e (2026-08-17): the L=128/chi=512
# cylinder headline (L^2 chi^2 = 4.3e9) wins on the TPU (28.9-45 s vs 64.7 s
# one quiet CPU core), while the aux configs (<= 2.7e8) lose 4-10x to
# dispatch/transfer latency.
_SMALL_WORK = float(os.environ.get("TEMFPY_TPU_SMALL_WORK", "1e9"))

# Bond-dimension threshold above which the tensor-fill scatter targets are
# sharded along their leading bond axis over the active mesh ("cuts" axis).
# At chi=4096 a bucketed f64 site tensor is ~256 MB (BASELINE config 5) and
# must not materialise replicated on every chip; small tensors stay
# replicated because per-site collectives cost more than they save.
CHI_SHARD_MIN = int(os.environ.get("TEMFPY_TPU_CHI_SHARD_MIN", "2048"))

import threading as _threading  # noqa: E402

_tls = _threading.local()


def prefer_cpu_now() -> bool:
    """True inside a :func:`compute_context` that rerouted to XLA:CPU.

    Layout branches in the kernels (batch-last vs batch-first LU, one-hot
    MXU selection vs plain gather) consult this at trace time, because a
    traced array cannot be asked for its device."""
    return getattr(_tls, "cpu_mode", False)


import contextlib as _contextlib  # noqa: E402


@_contextlib.contextmanager
def _cpu_reroute(dev):
    """default_device(cpu) + the trace-time layout flag, with the persistent
    compilation cache suspended: XLA:CPU AOT reload is unreliable (machine
    feature mismatch on reload -> failed loads / SIGILL risk — the reason
    the cache is never enabled on CPU backends), and a rerouted flow would
    otherwise both store and re-load CPU executables through it."""
    prev = getattr(_tls, "cpu_mode", False)
    prev_cache = jax.config.jax_compilation_cache_dir
    _tls.cpu_mode = True
    try:
        if prev_cache is not None:
            jax.config.update("jax_compilation_cache_dir", None)
        with jax.default_device(dev):
            yield
    finally:
        _tls.cpu_mode = prev
        if prev_cache is not None:
            jax.config.update("jax_compilation_cache_dir", prev_cache)



def compute_context(work_estimate: float):
    """Device-placement policy for one conversion/projection flow.

    On accelerator backends, problems below the ``TEMFPY_TPU_SMALL_WORK``
    work estimate (~L^2 chi^2) run on the in-process XLA:CPU backend via
    ``jax.default_device``: small conversions are dispatch/transfer bound —
    on the tunnel-attached TPU every device->host fetch pays ~30 ms latency
    at ~1 MB/s (BASELINE.md), which dwarfs their compute.  Large problems
    and CPU/GPU backends return a null context (no behaviour change).
    Override: TEMFPY_TPU_SMALL_WORK=0 disables the rerouting entirely.
    """
    if jax.default_backend() in ("cpu", "gpu"):
        return _contextlib.nullcontext()
    if not (_SMALL_WORK > 0) or work_estimate >= _SMALL_WORK:
        return _contextlib.nullcontext()
    from .parallel.mesh import active_mesh

    if active_mesh() is not None:  # mesh runs stay on the mesh devices
        return _contextlib.nullcontext()
    dev = cpu_device()
    if dev is None:
        return _contextlib.nullcontext()
    return _cpu_reroute(dev)


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
