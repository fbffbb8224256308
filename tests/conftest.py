"""Pytest configuration: run everything on a virtual 8-device CPU mesh.

This must execute before jax (or anything importing it) loads:
- strips the axon TPU sitecustomize (single-chip claim would serialize /
  deadlock test processes),
- forces the CPU backend with 8 virtual devices so sharding tests exercise
  real multi-device code paths,
- enables x64.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # the in-process CPU communicator aborts a collective whose partner
    # thread lags past ~8 min; on this 1-core box the 8 virtual devices'
    # thunks serialize, so heavily queued mesh-resident runs (the slow-tier
    # residency tests, examples/north_star_probe.py) can trip it — raise it
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = flags

# Prevent the axon PJRT plugin (registered via /root/.axon_site sitecustomize
# on PYTHONPATH) from claiming the TPU tunnel inside test runs.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
sys.modules.pop("jax_plugins", None)

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter boot, clobbering the env var; override it back before any
# backend is initialized (initialization is lazy, so this is safe here).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
