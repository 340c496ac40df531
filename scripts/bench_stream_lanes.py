"""Sweep stream-MSM lane counts at n=2^18 on the real chip.

The suffix doubling-scan costs log2(L) full-add rounds over nwin*L lanes;
halving L halves that phase while the madd work (T*L ~= 1.2n) is
invariant.  This script measures end-to-end stream MSM wall time per
lane count to pick the production default (ROUND4 open item (c)).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    n = 1 << 18
    from pcd_tpu.curves import models as M
    from pcd_tpu.ops.msm_stream import StreamMSMCtx

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

    # host oracle for correctness
    from pcd_tpu.msm.host import encode_query
    from pcd_tpu.msm.host import msm as host_msm

    enc = encode_query(pts)
    want = host_msm(enc, scalars)

    lanes_list = [int(a) for a in sys.argv[1:]] or [8192, 4096, 2048]
    for lanes in lanes_list:
        sctx = StreamMSMCtx(cfg.g1, cfg.Fr.BITS, lanes=lanes)
        XY, inf = sctx.encode_table(pts)
        limbs = sctx.limb_rows(scalars)
        got = sctx.msm_limbs(XY, limbs, inf)  # compile + warm + check
        ok = got == want
        times = []
        for _ in range(3):
            t0 = time.time()
            sctx.msm_limbs(XY, limbs, inf)
            times.append(time.time() - t0)
        best = min(times)
        print(f"lanes={lanes:5d} ok={ok} best={best:.3f}s "
              f"({n/best/1e6:.4f} Mpts/s) times={[round(t,3) for t in times]}",
              flush=True)


if __name__ == "__main__":
    main()
