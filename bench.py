#!/usr/bin/env python
"""Headline benchmark: Slater -> finite MPS conversion at L=256, chi=512.

Prints ONE JSON line:
  {"metric": "slater_to_mps_L256_chi512_seconds", "value": <s>, "unit": "s",
   "vs_baseline": <speedup vs the recorded single-host CPU baseline>}

The reference library publishes no numbers (BASELINE.md), so the baseline is
this library's own conversion measured on the host CPU (single process,
recorded below with provenance).  vs_baseline > 1 means faster than that CPU
baseline.

Usage:  python bench.py [--L 256] [--chi 512] [--cpu] [--dtype f64|f32]
"""

import argparse
import json
import sys
import time

import numpy as np


# Measured on this container's CPU (JAX CPU backend, float64, warm-compiled
# second run, W=8 tight-binding cylinder model below; 2026-08-16, round 1).
# The host has ONE core shared with the session driver, so CPU wall-clock
# carries up to ~2-4x contention noise; each entry is the FASTEST (least
# contended, i.e. most conservative) measurement observed — see BASELINE.md:
CPU_BASELINE_SECONDS = {
    (64, 128): 1.28,
    (128, 512): 64.7,
    (256, 512): 466.4,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=256)
    p.add_argument("--chi", type=int, default=512)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--dtype", default="f64", choices=["f64", "f32"])
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--width", type=int, default=8, help="cylinder circumference")
    p.add_argument("--verbose", action="store_true")
    p.add_argument(
        "--profile", action="store_true",
        help="print a per-stage wall-clock breakdown of each run to stderr",
    )
    args = p.parse_args()

    import os

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path[:] = [q for q in sys.path if ".axon_site" not in q]

    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from temfpy_tpu import config as tcfg

    if args.dtype == "f32":
        tcfg.set_dtype("float32")

    import temfpy_tpu.testing as tst

    tst.TEST_ACTION = "pass"  # production mode: skip numerical self-checks

    from temfpy_tpu import slater

    L, chi = args.L, args.chi

    # tight-binding cylinder (width W, periodic around the circumference,
    # weak dimerization along the axis to open a gap): the center-cut
    # entanglement scales with W, so chi genuinely binds — the shape of
    # BASELINE configs 4/5
    W = args.width
    assert L % W == 0, "--L must be divisible by --width"
    Lx = L // W
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                t = -1.0 if x % 2 == 0 else -1.3
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = t
            if W > 1:
                H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    H -= 0.05 * np.eye(L)  # break particle-hole degeneracy slightly

    dev = jax.devices()[0]
    if args.verbose:
        print(f"device: {dev}", file=sys.stderr)

    C, _ = slater.correlation_matrix(H)

    times = []
    mps = None
    try:
        from temfpy_tpu import profiling
        import contextlib

        for rep in range(max(2, args.repeat)):
            prof_cm = profiling.collect() if args.profile else contextlib.nullcontext()
            t0 = time.perf_counter()
            with prof_cm as prof:
                mps = slater.C_to_MPS(C, {"chi_max": chi})
                # sync: touch every tensor (async device work lands here)
                with profiling.stage("device_sync"):
                    for B in mps._B:
                        B.block_until_ready()
            times.append(time.perf_counter() - t0)
            if args.verbose:
                print(f"run {rep}: {times[-1]:.2f}s", file=sys.stderr)
            if args.profile:
                print(prof.report(), file=sys.stderr, flush=True)
    except Exception as err:  # never leave the driver without a JSON line
        print(f"bench failed: {err!r}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": f"slater_to_mps_L{L}_chi{chi}_seconds",
                    "value": None,
                    "unit": "s",
                    "vs_baseline": None,
                    "error": repr(err)[:200],
                }
            )
        )
        return
    value = min(times[1:])  # warm runs only

    # cheap quality audit: Schmidt-weighted canonicality residual (the
    # unweighted max is dominated by borderline truncated states and is
    # O(1) by construction for any svd_min-truncated conversion)
    quality = 0.0
    import jax.numpy as jnp

    for i in (0, L // 2, L - 1):
        B = mps.get_B(i, mps.form[i])
        if mps.form[i] == "A":
            g = jnp.einsum("anb,anc->bc", B.conj(), B)
            w = jnp.asarray(mps.get_SR(i))
        else:
            g = jnp.einsum("anb,cnb->ac", B, B.conj())
            w = jnp.asarray(mps.get_SL(i))
        resid = w[:, None] * (g - jnp.eye(g.shape[0])) * w[None, :]
        quality = max(quality, float(jnp.linalg.norm(resid)))

    base = CPU_BASELINE_SECONDS.get((L, chi))
    out = {
        "metric": f"slater_to_mps_L{L}_chi{chi}_seconds",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(base / value, 3) if base else None,
    }
    extra = {
        "device": str(dev),
        "dtype": args.dtype,
        "canonical_residual": quality,
        "cold_seconds": round(times[0], 4),
        "chi_max_reached": mps.chi_max,
    }
    if args.verbose:
        print(json.dumps(extra), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
