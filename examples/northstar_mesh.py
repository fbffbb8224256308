"""North-star shape on the virtual mesh: L=1024 / chi=1024 Slater -> MPS
with MESH-RESIDENT tensors (round-4 finding: the produced tensors alone are
~68 GB, 4x a single v5e's HBM — the shape is a multi-chip problem by
*memory*; reference analogue: the per-site loop slater.py:1301-1346 writing
to host RAM).

Runs the production `slater.C_to_MPS` under `use_mesh` on an 8-virtual-
device CPU mesh with an all-devices "cuts" axis, so every produced tensor's
bond axis is sharded 8 ways (see slater.MPSTensorData.resolve_fill).
Records wall clock, per-device resident bytes, host peak RSS, and the
center-cut entanglement profile to a JSON report.

Usage (quiet host, takes hours on one core):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/northstar_mesh.py [--L 1024] [--chi 1024] [--out FILE]
"""

import argparse
import json
import logging
import os
import resource
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=1024)
    p.add_argument("--chi", type=int, default=1024)
    p.add_argument("--width", type=int, default=8)
    p.add_argument("--out", default="/tmp/northstar_mesh.json")
    p.add_argument("--devices", type=int, default=8)
    args = p.parse_args()

    # CPU mesh before jax loads (mirrors tests/conftest.py)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    sys.path[:] = [q for q in sys.path if ".axon_site" not in q]
    sys.modules.pop("jax_plugins", None)
    # the rank-update partials are replicated (they would re-materialise the
    # memory the sharding avoids); resolve_fill also gates them off, but be
    # explicit for the record
    os.environ.setdefault("TEMFPY_TPU_DET_UPDATES", "0")

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import temfpy_tpu.testing as tst

    tst.TEST_ACTION = "pass"  # production mode
    from temfpy_tpu import config, slater
    from temfpy_tpu.parallel.mesh import use_mesh
    from jax.sharding import Mesh

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    L, chi, W = args.L, args.chi, args.width
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
    H -= 0.05 * np.eye(L)

    # make sure the chi-shard residency gate fires at this chi
    config.CHI_SHARD_MIN = min(config.CHI_SHARD_MIN, chi)

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(len(devs), 1), ("cuts", "pairs"))
    print(f"mesh: {dict(mesh.shape)}  L={L} chi={chi}", flush=True)

    C, _N = slater.correlation_matrix(H)
    t0 = time.time()
    with use_mesh(mesh):
        mps = slater.C_to_MPS(C, {"chi_max": chi})
    wall = time.time() - t0
    print(f"conversion wall: {wall:.1f} s", flush=True)

    per_dev, n_sharded, tot = {}, 0, 0
    for t in mps._B:
        sh = t.sharding.shard_shape(t.shape)
        if sh != t.shape:
            n_sharded += 1
        tot += t.nbytes
        for d in t.sharding.device_set:
            per_dev[d.id] = per_dev.get(d.id, 0) + (
                int(np.prod(sh)) * t.dtype.itemsize
            )
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    ent = mps.entanglement_entropy()
    rep = {
        "L": L,
        "chi": chi,
        "chi_max_reached": int(mps.chi_max),
        "wall_seconds": wall,
        "n_devices": len(devs),
        "sharded_tensors": n_sharded,
        "total_tensor_bytes": int(tot),
        "per_device_tensor_bytes": {str(k): int(v) for k, v in sorted(per_dev.items())},
        "host_peak_rss_bytes": int(rss),
        "center_entropy": float(ent[L // 2]),
        "max_entropy": float(max(ent)),
    }
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1), flush=True)


if __name__ == "__main__":
    main()
