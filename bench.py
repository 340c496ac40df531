"""Round benchmark — run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current headline metric: device Pippenger MSM throughput on MNT4-298 G1
(the #1 hot loop of Groth16 proving — BASELINE.md "MSM Mpoints/s/chip").
The reference publishes no numbers (BASELINE.md), so round 1 *establishes*
the baseline; vs_baseline is the ratio against a 1.0 Mpoints/s/chip
nominal target.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcd_tpu.curves import models as M
    from pcd_tpu.ops.msm_tensor import msm_ctx

    from pcd_tpu.ops.msm_tensor import MSMTensorCtx

    # modest window-chunk: keeps the XLA program small enough to compile
    # through the TPU tunnel within the driver's budget
    MSMTensorCtx.WINDOW_CHUNK = 4
    cfg = M.mnt4_298()
    n = 8192
    mctx = msm_ctx(cfg.g1, cfg.Fr.BITS, c=8)

    # synthetic but valid points: doubling chain from the generator
    g = cfg.g1_gen
    pts = []
    P = g
    for _ in range(n):
        pts.append(P)
        P = P + P if len(pts) % 2 else P + g
    X, Y, Z = mctx.ec.encode_points(pts)
    points = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
    rng = np.random.default_rng(42)
    digits = jnp.asarray(
        rng.integers(0, 256, size=(mctx.nwin, n)).astype(np.uint32))

    # compile + warmup
    out = mctx.msm_digits(points, digits)
    _ = tuple(np.asarray(c) for c in out)

    times = []
    for i in range(3):
        d2 = jnp.asarray(
            rng.integers(0, 256, size=(mctx.nwin, n)).astype(np.uint32))
        t0 = time.time()
        out = mctx.msm_digits(points, d2)
        _ = tuple(np.asarray(c) for c in out)  # force full execution + fetch
        times.append(time.time() - t0)

    best = min(times)
    mpts = n / best / 1e6
    print(json.dumps({
        "metric": "msm_mnt4_298_g1_throughput",
        "value": round(mpts, 4),
        "unit": "Mpoints/s/chip",
        "vs_baseline": round(mpts / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
