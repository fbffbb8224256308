#!/usr/bin/env python
"""Headline benchmark: Slater -> finite MPS conversion at L=256, chi=512,
plus tracked timings for the other BASELINE configs (Kitaev Pfaffian, iMPS
unit cell, Gutzwiller pi-flux).

Prints ONE JSON line:
  {"metric": "slater_to_mps_L256_chi512_seconds", "value": <s>, "unit": "s",
   "vs_baseline": <speedup vs the recorded single-host CPU baseline>,
   "extra_metrics": {"pfaffian_kitaev_L64_chi128_seconds": ..., ...}}

The reference library publishes no numbers (BASELINE.md), so the baseline is
this library's own conversion measured on the host CPU (single process,
recorded below with provenance).  vs_baseline > 1 means faster than that CPU
baseline.

Usage:  python bench.py [--L 256] [--chi 512] [--cpu] [--dtype f64|f32]
                        [--configs 1,2,3,4] [--profile] [--verbose]
"""

import argparse
import json
import sys
import time

import numpy as np


# Measured on this container's CPU (JAX CPU backend, float64, warm-compiled
# second run; 2026-08-16).  The host has ONE core shared with the session
# driver, so CPU wall-clock carries up to ~2-4x contention noise; each entry
# is the FASTEST (least contended, i.e. most conservative) measurement
# observed — see BASELINE.md.
CPU_BASELINE_SECONDS = {
    # (L, chi) of the W=8 tight-binding cylinder slater headline
    (64, 128): 1.28,
    (128, 512): 64.7,
    (256, 512): 466.4,
}
# warm CPU seconds for the auxiliary configs (same machine/protocol;
# measured 2026-08-16, quiet host, `python bench.py --cpu --configs 2,3,4`)
CPU_BASELINE_EXTRA = {
    "pfaffian_kitaev_L64_chi128_seconds": 1.75,
    "slater_imps_L128_cell2_chi64_seconds": 0.23,
    "gutzwiller_piflux_W4_L32_chi128_seconds": 5.65,
    # near-critical p+ip cylinder (chi_max_reached = 256, binding); measured
    # 2026-08-17, quiet host, `python bench.py --cpu --configs 5`
    "pfaffian_pip_W8_L128_chi256_seconds": 278.5,
}


PROFILE_AUX = False  # set by main() --profile: per-stage report of warm runs


def _timed(fn, repeat):
    """(warm_seconds, cold_seconds): best of the warm runs."""
    import contextlib

    times = []
    for rep in range(max(2, repeat)):
        prof_cm = contextlib.nullcontext()
        if PROFILE_AUX and rep > 0:
            from temfpy_tpu import profiling

            prof_cm = profiling.collect()
        t0 = time.perf_counter()
        with prof_cm as prof:
            fn()
        times.append(time.perf_counter() - t0)
        if PROFILE_AUX and rep > 0:
            print(prof.report(), file=sys.stderr, flush=True)
    return min(times[1:]), times[0]


def bench_pfaffian_kitaev(L=64, chi=128, repeat=2):
    """BASELINE config 2: open Kitaev chain (trivial gapped phase) BdG
    state -> finite MPS via the Pfaffian-sign path."""
    from temfpy_tpu import pfaffian

    H = np.zeros((2 * L, 2 * L), complex)
    t, delta, mu = 1.0, 1.0, 3.0
    for i in range(L):
        H[2 * i, 2 * i] = -mu / 2
        H[2 * i + 1, 2 * i + 1] = mu / 2
    for i in range(L - 1):
        H[2 * i, 2 * (i + 1)] += -t / 2
        H[2 * (i + 1), 2 * i] += -t / 2
        H[2 * i + 1, 2 * (i + 1) + 1] += t / 2
        H[2 * (i + 1) + 1, 2 * i + 1] += t / 2
        H[2 * i, 2 * (i + 1) + 1] += delta / 2
        H[2 * (i + 1) + 1, 2 * i] += delta / 2
        H[2 * i + 1, 2 * (i + 1)] += -delta / 2
        H[2 * (i + 1), 2 * i + 1] += -delta / 2
    H = H + H.conj().T - np.diag(np.diag(H).real)
    C = pfaffian.correlation_matrix(H, basis="C->M")

    state = {}

    def run():
        state["mps"] = pfaffian.C_to_MPS(C, {"chi_max": chi}, basis="M")

    warm, cold = _timed(run, repeat)
    return warm, cold, {"chi_max_reached": state["mps"].chi_max}


def bench_pfaffian_pip(W=8, Lx=16, chi=256, repeat=2):
    """Pfaffian stress config (BASELINE config-5 model): chiral p+ip
    superconductor on a W-leg cylinder, tuned to the trivial side near the
    gap closing (bulk gap ~ 0.02 < 1/Lx: effectively critical), where the
    BdG entanglement genuinely binds chi — exercises the Pfaffian fill at
    production bond dimension (the gapped Kitaev config reaches chi ~ 14).
    A 1D chain cannot serve here: the area law caps its chi at ~ 10-30
    regardless of the gap."""
    from temfpy_tpu import pfaffian

    t, delta, mu = 1.0, 0.5, -0.3
    L = W * Lx
    H = np.zeros((2 * L, 2 * L), complex)

    def idx(x, y):
        return x * W + (y % W)

    def add_hop(i, j, amp):
        H[2 * i, 2 * j] += -amp / 2
        H[2 * j, 2 * i] += -np.conj(amp) / 2
        H[2 * i + 1, 2 * j + 1] += np.conj(amp) / 2
        H[2 * j + 1, 2 * i + 1] += amp / 2

    def add_pair(i, j, amp):  # amp c_i^dag c_j^dag + h.c.
        H[2 * i, 2 * j + 1] += amp / 2
        H[2 * j + 1, 2 * i] += np.conj(amp) / 2
        H[2 * j, 2 * i + 1] += -amp / 2
        H[2 * i + 1, 2 * j] += -np.conj(amp) / 2

    for x in range(Lx):
        for y in range(W):
            i = idx(x, y)
            H[2 * i, 2 * i] = -mu / 2
            H[2 * i + 1, 2 * i + 1] = mu / 2
            if x + 1 < Lx:
                add_hop(i, idx(x + 1, y), t)
                add_pair(i, idx(x + 1, y), delta)  # p_x
            if W > 2:
                add_hop(i, idx(x, y + 1), t)
                add_pair(i, idx(x, y + 1), 1j * delta)  # i p_y
    H = H + H.conj().T - np.diag(np.diag(H).real)
    C = pfaffian.correlation_matrix(H, basis="C->M")

    state = {}

    def run():
        state["mps"] = pfaffian.C_to_MPS(C, {"chi_max": chi}, basis="M")

    warm, cold = _timed(run, repeat)
    return warm, cold, {"chi_max_reached": state["mps"].chi_max}


def bench_slater_imps(L=128, cell=2, chi=64, repeat=2):
    """BASELINE config 3: translation-invariant free fermions -> iMPS unit
    cell via the correlation-matrix route (dimerized hopping chain)."""
    from temfpy_tpu import slater

    def hop(n):
        H = np.zeros((n, n))
        for i in range(n - 1):
            H[i, i + 1] = H[i + 1, i] = -1.0 - 0.3 * (-1) ** i
        return H

    state = {}

    def run():
        state["out"] = slater.H_to_iMPS(
            hop(L), hop(L + cell), {"chi_max": chi},
            sites_per_cell=cell, cut=L // 2,
        )

    warm, cold = _timed(run, repeat)
    imps = state["out"][0] if isinstance(state["out"], tuple) else state["out"]
    return warm, cold, {"chi_max_reached": imps.chi_max}


def bench_gutzwiller_piflux(W=4, Lx=8, chi=128, repeat=2):
    """BASELINE config 4: pi-flux Slater determinant on a W-leg cylinder,
    spinful PH doubling -> Gutzwiller projection to a spin-1/2 MPS."""
    from temfpy_tpu import gutzwiller, slater

    L = W * Lx
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                # pi flux: alternate sign of the axial bonds with y
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = (
                    -1.0 if y % 2 == 0 else 1.0
                )
            if W > 1:
                H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    H -= 1e-4 * np.diag(np.arange(L))  # split exact degeneracies

    state = {}

    def run():
        mps = slater.H_to_MPS(H, {"chi_max": chi}, spinful="PH")
        state["spin"] = gutzwiller.abrikosov_ph(mps)

    warm, cold = _timed(run, repeat)
    return warm, cold, {"chi_spin": state["spin"].chi_max}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=256)
    p.add_argument("--chi", type=int, default=512)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--dtype", default="f64", choices=["f64", "f32"])
    # default 3 = one cold + TWO warm runs per config; `value` takes the best
    # warm run.  The shared host's throughput swings 2-3x by time of day
    # (BASELINE.md round-4 variance caveat) — with a single warm run the
    # recorded number is a coin flip on the window.
    p.add_argument("--repeat", type=int, default=3)
    p.add_argument("--width", type=int, default=8, help="cylinder circumference")
    p.add_argument("--verbose", action="store_true")
    p.add_argument(
        "--configs", default="1,2,3,4,5",
        help="comma list of BASELINE configs to run (1=slater headline, "
        "2=Kitaev Pfaffian, 3=slater iMPS, 4=Gutzwiller pi-flux, "
        "5=near-critical p+ip cylinder Pfaffian stress)",
    )
    p.add_argument(
        "--profile", action="store_true",
        help="print a per-stage wall-clock breakdown of each run to stderr",
    )
    args = p.parse_args()
    if args.profile:
        global PROFILE_AUX
        PROFILE_AUX = True
    configs = {c.strip() for c in args.configs.split(",") if c.strip()}

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

    # backend-init watchdog: a wedged TPU tunnel hangs jax.devices()
    # forever with ~0 CPU (BASELINE.md round-3 notes); emit the JSON
    # contract line and die instead of hanging the driver.
    import threading

    backend_ready = threading.Event()

    def _watchdog():
        if not backend_ready.wait(timeout=300):
            print(
                json.dumps(
                    {
                        "metric": f"slater_to_mps_L{L}_chi{chi}_seconds",
                        "value": None,
                        "unit": "s",
                        "vs_baseline": None,
                        "error": "backend init timed out (wedged TPU tunnel?)",
                    }
                ),
                flush=True,
            )
            import os

            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    dev = jax.devices()[0]
    backend_ready.set()
    if args.verbose:
        print(f"device: {dev}", file=sys.stderr)

    C, _ = slater.correlation_matrix(H)

    value = None
    extra = {"device": str(dev), "dtype": args.dtype}
    extra_metrics = {}
    try:
        from temfpy_tpu import profiling
        import contextlib

        if "1" in configs:
            times = []
            mps = None
            for rep in range(max(2, args.repeat)):
                prof_cm = (
                    profiling.collect() if args.profile else contextlib.nullcontext()
                )
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
            value = min(times[1:])  # warm runs only

            # cheap quality audit: Schmidt-weighted canonicality residual
            # (the unweighted max is dominated by borderline truncated states
            # and is O(1) by construction for any svd_min-truncated
            # conversion)
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
            extra["canonical_residual"] = quality
            extra["cold_seconds"] = round(times[0], 4)
            extra["chi_max_reached"] = mps.chi_max

        aux = {
            "2": ("pfaffian_kitaev_L64_chi128_seconds", bench_pfaffian_kitaev),
            "3": ("slater_imps_L128_cell2_chi64_seconds", bench_slater_imps),
            "4": ("gutzwiller_piflux_W4_L32_chi128_seconds", bench_gutzwiller_piflux),
            "5": ("pfaffian_pip_W8_L128_chi256_seconds", bench_pfaffian_pip),
        }
        for key, (name, fn) in aux.items():
            if key not in configs:
                continue
            warm, cold, info = fn(repeat=args.repeat)
            base = CPU_BASELINE_EXTRA.get(name)
            extra_metrics[name] = {
                "value": round(warm, 4),
                "unit": "s",
                "vs_baseline": round(base / warm, 3) if base else None,
                "cold_seconds": round(cold, 4),
                **info,
            }
            if args.verbose:
                print(f"{name}: {warm:.2f}s warm / {cold:.2f}s cold",
                      file=sys.stderr)
    except Exception as err:  # never leave the driver without a JSON line
        print(f"bench failed: {err!r}", file=sys.stderr)
        import traceback

        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": f"slater_to_mps_L{L}_chi{chi}_seconds",
                    "value": round(value, 4) if value else None,
                    "unit": "s",
                    "vs_baseline": None,
                    "error": repr(err)[:200],
                    "extra_metrics": extra_metrics,
                }
            )
        )
        return

    base = CPU_BASELINE_SECONDS.get((L, chi))
    out = {
        "metric": f"slater_to_mps_L{L}_chi{chi}_seconds",
        "value": round(value, 4) if value is not None else None,
        "unit": "s",
        "vs_baseline": round(base / value, 3) if (base and value) else None,
    }
    if extra_metrics:
        out["extra_metrics"] = extra_metrics
    if args.verbose:
        print(json.dumps(extra), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
