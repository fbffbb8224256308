"""BASELINE config-5 memory-design probe: a conversion that genuinely
reaches chi >= 2048 through the chi-sharded fill at its DEFAULT gate
(config.CHI_SHARD_MIN = 2048), on the 8-virtual-device CPU mesh.

Asserts bit-identity against the unsharded conversion and reports the
sharding layout + per-device bytes of the largest tensors.  On the CPU
mesh all shards live in one host memory space, so the per-device numbers
are computed from the sharding spec (global bytes / shards); observing
them on real chips needs multi-chip hardware.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/chi_shard_probe.py [chi]
"""

import resource
import sys
import time

import numpy as np


def cylinder_H(W=12, Lx=4):
    L = W * Lx
    H = np.zeros((L, L))

    def idx(x, y):
        return x * W + y % W

    for x in range(Lx):
        for y in range(W):
            if x + 1 < Lx:
                t = -1.0 if x % 2 == 0 else -1.1
                H[idx(x, y), idx(x + 1, y)] = H[idx(x + 1, y), idx(x, y)] = t
            H[idx(x, y), idx(x, y + 1)] = H[idx(x, y + 1), idx(x, y)] = -1.0
    H -= 0.05 * np.eye(L)
    H -= 1e-4 * np.diag(np.arange(L))
    return H


def main(chi=2048, check_identity=True):
    import jax

    import temfpy_tpu.testing as tst
    from temfpy_tpu import config, slater
    from temfpy_tpu.parallel import mesh as pmesh

    tst.TEST_ACTION = "pass"
    H = cylinder_H()
    C = np.asarray(slater.correlation_matrix(H)[0])

    print(f"devices: {len(jax.devices())}, CHI_SHARD_MIN: "
          f"{config.CHI_SHARD_MIN} (default gate)")

    shard_calls = []
    orig = slater._sharded_packed_fill

    def spy(mesh, ndim):
        shard_calls.append(ndim)
        return orig(mesh, ndim)

    slater._sharded_packed_fill = spy
    t0 = time.time()
    with pmesh.use_mesh(pmesh.make_mesh()):
        out = slater.C_to_MPS(C, {"chi_max": chi})
    t_shard = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    slater._sharded_packed_fill = orig

    chi_reached = out.chi_max
    big = max(out._B, key=lambda b: np.prod(b.shape))
    print(f"sharded run: {t_shard:.1f}s  chi reached {chi_reached}  "
          f"peak RSS {rss:.1f} GB")
    print(f"chi-sharded fill buckets taken: {len(shard_calls)} "
          f"(ndims {sorted(set(shard_calls))})")
    gb = np.prod(big.shape) * 8
    print(f"largest site tensor {big.shape}: {gb/1e6:.0f} MB global -> "
          f"{gb/8e6:.0f} MB/device under the 8-way bond sharding")
    assert shard_calls, (
        "no fill bucket crossed CHI_SHARD_MIN - the probe did not exercise "
        "the config-5 path (chi reached %d)" % chi_reached
    )

    if check_identity:
        t0 = time.time()
        ref = slater.C_to_MPS(C, {"chi_max": chi})
        print(f"replicated run: {time.time()-t0:.1f}s")
        for i, (a, b) in enumerate(zip(ref._B, out._B)):
            dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
            assert dev == 0.0, f"site {i} deviates by {dev}"
        for sa, sb in zip(ref._S, out._S):
            np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
        print("bit-identity vs unsharded conversion: PASS")
    return out


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
