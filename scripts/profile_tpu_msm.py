"""Phase-level profile of the device MSM at n=2^18 (MNT4-298 G1).

Times, separately: host digit conversion, device window-sum graph with
the real digits (end-to-end), and ablations (no-sort: pre-sorted digits;
bucket-phase-only) to attribute device time between argsort+gather,
segmented scan, and the bucket suffix scans.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def t(f, reps=3, warm=1):
    for _ in range(warm):
        r = f()
    jax.block_until_ready(r) if hasattr(r, "block_until_ready") else None
    times = []
    for _ in range(reps):
        t0 = time.time()
        r = f()
        if isinstance(r, tuple):
            for x in r:
                jax.block_until_ready(x)
        elif hasattr(r, "block_until_ready"):
            jax.block_until_ready(r)
        times.append(time.time() - t0)
    return min(times)


def main():
    from pcd_tpu.curves import models as M
    from pcd_tpu.ops.msm_tensor import msm_ctx_for

    n = 1 << 18
    cfg = M.mnt4_298()
    g = cfg.g1_gen
    base = [g]
    for _ in range(4095):
        base.append(base[-1] + g)
    pts = [base[i % 4096] for i in range(n)]
    rng = np.random.default_rng(42)
    r = cfg.g1.order
    scalars = [(int(x) * 0x9E3779B97F4A7C15) % r
               for x in rng.integers(1, 1 << 63, size=n)]

    mctx = msm_ctx_for(cfg.g1, cfg.Fr.BITS, n)
    print(f"backend={mctx.backend} c={mctx.c} signed={mctx.signed} "
          f"nwin={mctx.nwin}", flush=True)
    X, Y, Z = mctx.ec.encode_points(pts)
    P = tuple(jnp.asarray(a) for a in (X, Y, Z))

    td = t(lambda: mctx.digits_from_ints(scalars), reps=3)
    print(f"digits_from_ints (host): {td:.3f}s", flush=True)

    digits = jnp.asarray(mctx.digits_from_ints(scalars))

    tw = t(lambda: mctx._window_sums_jit(P, digits))
    print(f"window_sums (device, e2e): {tw:.3f}s", flush=True)

    # ablation: digits already sorted per window -> argsort nearly free?
    # no: argsort still runs. Instead time JUST the sort+gather by scanning
    # a graph that sorts and returns gathered coords summed trivially.
    @jax.jit
    def sort_gather_only(P, digits):
        def body(carry, dw):
            order = jnp.argsort(dw & jnp.uint32(0x7FFFFFFF))
            Xs = P[0][order]
            Ys = P[1][order]
            Zs = P[2][order]
            return carry, (Xs.sum(), Ys.sum(), Zs.sum())
        _, out = jax.lax.scan(body, 0, digits[:, None, :].reshape(
            digits.shape[0], digits.shape[1]))
        return out

    ts = t(lambda: sort_gather_only(P, digits))
    print(f"sort+gather only: {ts:.3f}s", flush=True)

    # ablation: full pipeline minus the bucket suffix scans: use the
    # segmented scan but only sum the last element
    ec = mctx.ec

    @jax.jit
    def seg_scan_only(P, digits):
        def body(carry, dw):
            mag = dw & jnp.uint32(0x7FFFFFFF)
            sgn = (dw >> 31).astype(jnp.bool_)
            order = jnp.argsort(mag)
            d_sorted = mag[order]
            sgn_s = sgn[order]
            Xs, Ys, Zs = P[0][order], P[1][order], P[2][order]
            _, Yn, _ = ec.neg((Xs, Ys, Zs))
            Xs, Ys, Zs = ec.select(sgn_s, (Xs, Yn, Zs), (Xs, Ys, Zs))
            prev = jnp.concatenate(
                [jnp.full((1,), 0xFFFFFFFF, dtype=d_sorted.dtype),
                 d_sorted[:-1]])
            flags = d_sorted != prev

            def comb(a, b):
                fa, Xa, Ya, Za = a
                fb, Xb, Yb, Zb = b
                added = ec.add((Xa, Ya, Za), (Xb, Yb, Zb))
                sel = ec.select(fb, (Xb, Yb, Zb), added)
                return (fa | fb, sel[0], sel[1], sel[2])

            sc = jax.lax.associative_scan(comb, (flags, Xs, Ys, Zs), axis=0)
            return carry, (sc[1][-1], sc[2][-1], sc[3][-1])

        _, out = jax.lax.scan(body, 0, digits)
        return out

    tseg = t(lambda: seg_scan_only(P, digits))
    print(f"sort+gather+seg-scan (no bucket phase): {tseg:.3f}s", flush=True)
    print(f"=> bucket phase ~ {tw - tseg:.3f}s, "
          f"seg-scan ~ {tseg - ts:.3f}s, sort+gather ~ {ts:.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
