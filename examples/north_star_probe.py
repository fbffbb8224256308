"""North-star residency probe: the L=1024 / chi=1024 Slater conversion,
mesh-resident on the 8-virtual-device CPU mesh.

Round 4 proved this shape CANNOT fit one v5e chip: the produced chain is
~17 GB true-shape (68 GB bucketed) against 16 GB of HBM, and host offload
is transfer-bound (BASELINE.md round 4).  The escape is multi-chip
residency: every produced site tensor keeps its bond axis sharded over the
mesh (1/N per device), which the chi-sharded fill provides and the
mesh-resident canonical sweep preserves.  This probe runs the full shape on
the virtual mesh (one host memory space — per-device numbers derive from
the sharding specs; wall-clock is NOT a TPU number) and records:

- completion + wall time + peak RSS,
- per-device resident bytes of the output chain and the shard balance,
- number of bond-sharded tensors and the chi profile,
- a small-scale bit-identity control (sharded vs replicated conversion),
- left/right canonicality residuals of sampled tensors.

Run:
    XLA_FLAGS="--xla_force_host_platform_device_count=8 \
        --xla_cpu_collective_call_warn_stuck_timeout_seconds=600 \
        --xla_cpu_collective_call_terminate_timeout_seconds=7200" \
        JAX_PLATFORMS=cpu python examples/north_star_probe.py [L] [chi]

(The collective timeout flags matter on few-core hosts: the in-process CPU
communicator ABORTS an all-gather whose partner device's thunk lags past
~8 min, and with 8 virtual devices serialized onto one core the sweep's
per-site gathers legitimately queue that long at this scale.)
"""

import resource
import sys
import time

import numpy as np


def cylinder_C(L, W=8):
    """The bench-protocol gapped tight-binding cylinder (bench.py): weak
    axial dimerization opens a gap; the center-cut entanglement scales with
    W so chi genuinely binds."""
    assert L % W == 0
    Lx = L // W
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                t = -1.0 if x % 2 == 0 else -1.15
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = t
            H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    H -= 0.05 * np.eye(L)
    H -= 1e-4 * np.diag(np.arange(L))
    e, v = np.linalg.eigh(H)
    occ = v[:, e < 0]
    return occ @ occ.T


def shard_report(tensors):
    """(#sharded, per-device bytes, global bytes) from the sharding specs."""
    n_sharded = 0
    per_dev = {}
    total = 0
    for t in tensors:
        if isinstance(t, np.ndarray):
            total += t.nbytes
            continue
        total += int(np.prod(t.shape)) * t.dtype.itemsize
        sh = t.sharding.shard_shape(t.shape)
        if sh != t.shape:
            n_sharded += 1
        nb = int(np.prod(sh)) * t.dtype.itemsize
        for d in t.sharding.device_set:
            per_dev[d.id] = per_dev.get(d.id, 0) + nb
    return n_sharded, per_dev, total


def canonicality_residual(mps, sites):
    """max over sampled sites of || sum_n B_n B_n^H - I || (B form).
    Gathers each sampled tensor to HOST (np.asarray assembles the shards
    without collectives) — an eager einsum on a bond-sharded tensor would
    compile resharding collectives, the virtual-mesh deadlock class."""
    import jax.numpy as jnp

    worst = 0.0
    for i in sites:
        B = jnp.asarray(np.asarray(mps._B[i]))
        if mps.form[i] == "A":  # left-canonical sites left of the center
            G = jnp.einsum("anb,anc->bc", B, B)
        else:
            G = jnp.einsum("anb,cnb->ac", B, B)
        r = float(jnp.abs(G - jnp.eye(G.shape[0], dtype=G.dtype)).max())
        worst = max(worst, r)
    return worst


def control(slater, pmesh, config):
    """Small-scale bit-identity control: gate-forced sharded conversion ==
    replicated conversion, tensor by tensor."""
    C = cylinder_C(64, W=8)
    ref = slater.C_to_MPS(C, {"chi_max": 64})
    prev = config.CHI_SHARD_MIN
    config.CHI_SHARD_MIN = 64
    try:
        with pmesh.use_mesh(pmesh.make_mesh()):
            out = slater.C_to_MPS(C, {"chi_max": 64})
    finally:
        config.CHI_SHARD_MIN = prev
    worst = 0.0
    for i, (a, b) in enumerate(zip(ref._B, out._B)):
        dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        worst = max(worst, dev)
        # mesh-resident slicing reassociates the fill reductions: ULP-level
        # deviations are expected (same 1e-12 contract as the dryrun)
        assert dev < 1e-12, f"control site {i} deviates by {dev}"
    n_sharded, per_dev, _ = shard_report(out._B)
    assert n_sharded > 0, "control conversion produced no sharded tensors"
    print(f"small-scale control: PASS ({n_sharded} sharded, "
          f"max dev {worst:.1e} < 1e-12)")


def main(L=1024, chi=1024):
    import jax

    import temfpy_tpu.testing as tst
    from temfpy_tpu import config, slater
    from temfpy_tpu.parallel import mesh as pmesh

    tst.TEST_ACTION = "pass"
    n_dev = len(jax.devices())
    # the chi=1024 bucketed bond is 1024-2048 depending on the site; gate at
    # the bucket floor so EVERY saturated site tensor stays mesh-resident
    config.CHI_SHARD_MIN = min(config.CHI_SHARD_MIN, max(chi, 64))
    print(f"devices: {n_dev}, CHI_SHARD_MIN: {config.CHI_SHARD_MIN}, "
          f"target L={L} chi={chi}")

    control(slater, pmesh, config)

    C = cylinder_C(L)
    t0 = time.time()
    with pmesh.use_mesh(pmesh.make_mesh()):
        out = slater.C_to_MPS(C, {"chi_max": chi})
    wall = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    n_sharded, per_dev, total = shard_report(out._B)

    chis = [out.chi(i) for i in range(out.L + 1)]
    print(f"north-star shape COMPLETED: {wall:.0f}s wall, peak RSS {rss:.1f} GB")
    print(f"chi reached {max(chis)} (saturated bonds: "
          f"{sum(c >= chi for c in chis)} of {len(chis)})")
    print(f"output chain {total/1e9:.1f} GB global; {n_sharded}/{out.L} "
          f"tensors bond-sharded")
    if per_dev:
        lo, hi = min(per_dev.values()), max(per_dev.values())
        print(f"per-device residency {lo/1e9:.2f}-{hi/1e9:.2f} GB "
              f"(balance {hi/max(lo,1):.3f}); replicated equivalent "
              f"{total/1e9:.1f} GB/device")
    mid = out.L // 2
    res = canonicality_residual(out, [1, mid - 1, mid, mid + 1, out.L - 2])
    print(f"sampled right-canonicality residual: {res:.2e}")
    return out


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
