"""TPU MSM benchmark: f32 fused-Pallas backend (c=16) vs the round-1 u32
path (c=8), with host-oracle validation at a small size first."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx

    print("devices:", jax.devices(), flush=True)
    cyc = mnt_cycle()
    cfg = cyc.main
    r = cfg.g1.order
    g = cfg.g1_gen
    rng = np.random.default_rng(11)

    # -- correctness: n=512, f32 backend, vs host oracle ------------------
    n0 = 512
    pts = [g * int(rng.integers(1, 1 << 60)) for _ in range(n0)]
    scalars = [int.from_bytes(rng.bytes(37), "little") % r
               for _ in range(n0)]
    scalars[0] = 0
    pts[1] = cfg.g1.infinity()
    ctx_f32 = msm_ctx(cfg.g1, cfg.Fr.BITS, 16, "f32")
    t0 = time.time()
    got = ctx_f32.msm(pts, scalars)
    print(f"f32 small msm ({time.time()-t0:.1f}s incl compile)", flush=True)
    want = host_msm(pts, scalars)
    assert got == want, "f32 MSM mismatch vs host oracle!"
    print("f32 MSM correctness OK", flush=True)

    # -- throughput at n = 2^18 -------------------------------------------
    for backend, c in (("f32", 16), ("u32", 8)):
        n = 1 << 18
        ctx = msm_ctx(cfg.g1, cfg.Fr.BITS, c, backend)
        base = [g * (i % 4096 + 1) for i in range(n)]
        if backend == "f32":
            X, Y, Z = ctx.ec.encode_points(base)
        else:
            X, Y, Z = ctx.ec.encode_points(base)
        P = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
        digits = jnp.asarray(rng.integers(
            0, 1 << c, size=(ctx.nwin, n)).astype(np.uint32))
        t0 = time.time()
        out = ctx.msm_to_host(P, digits)
        t_cold = time.time() - t0
        times = []
        for _ in range(2):
            d2 = jnp.asarray(rng.integers(
                0, 1 << c, size=(ctx.nwin, n)).astype(np.uint32))
            t0 = time.time()
            ctx.msm_to_host(P, d2)
            times.append(time.time() - t0)
        best = min(times)
        print(f"{backend} c={c} msm n=2^18: cold {t_cold:.1f}s, "
              f"warm {best:.2f}s -> {n / best / 1e6:.3f} Mpoints/s",
              flush=True)


if __name__ == "__main__":
    main()
