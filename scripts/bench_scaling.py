"""Virtual-mesh scaling measurement (VERDICT round-2 item 5): the same
sharded-MSM and distributed h-poly workload on a 1-device vs an 8-device
mesh.  NOTE: with xla_force_host_platform_device_count the 'devices' are
threads of one CPU, so this validates the scaling CODE PATH and gives a
software-overhead ratio — ICI efficiency on a real pod slice remains to
be measured on multi-chip hardware (none available in this environment;
BASELINE.md north-star >= 70%)."""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from pcd_tpu.curves.models import toy_mnt4
    from pcd_tpu.ops.msm_tensor import msm_ctx
    from pcd_tpu.parallel.dist import DistContext, DistHPoly
    from pcd_tpu.parallel.mesh import make_mesh
    from pcd_tpu.poly.domain import EvaluationDomain

    cfg = toy_mnt4()
    F = cfg.Fr
    p = F.MODULUS
    rng = np.random.default_rng(2)
    out = {}

    # 2^14 points: large enough that the stream tier's per-shard finish
    # phase (an Amdahl fixed cost replicated on every device) does not
    # drown the sharded madd work at 8 devices
    n = 1 << 14
    dom = EvaluationDomain.new(F, 1 << 10)
    g = cfg.g1_gen
    pts = [g * (i % 512 + 1) for i in range(n)]
    scalars = [int(rng.integers(0, cfg.g1.order)) for _ in range(n)]
    a_ev = [int(rng.integers(1, p)) for _ in range(dom.n)]
    b_ev = [int(rng.integers(1, p)) for _ in range(dom.n)]
    c_ev = [a * b % p for a, b in zip(a_ev, b_ev)]

    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        dctx = DistContext(mesh)
        # the PRODUCTION MSM tier, point-sharded (parallel/stream_dist.py;
        # VERDICT r4 item 4 — the vmesh measurement must cover the stream
        # architecture, not the deprecated scan path)
        from pcd_tpu.parallel.stream_dist import ShardedStreamMSM

        # equal TOTAL lane capacity across device counts so the ratio
        # isolates the sharding overhead (per-device work ~1/ndev)
        smsm = ShardedStreamMSM(cfg.g1, F.BITS, mesh, c=8,
                                lanes=max(128, 1024 // ndev))
        XY, infs = smsm.encode_table(pts)
        limbs = smsm.sctx.limb_rows(scalars, (F.BITS + 63) // 64 * 8)
        smsm.msm_limbs(XY, limbs, infs)  # compile
        t0 = time.time()
        for _ in range(3):
            smsm.msm_limbs(XY, limbs, infs)
        out[f"msm_{ndev}dev_s"] = round((time.time() - t0) / 3, 3)

        dh = DistHPoly(F, dom.n, mesh)
        dh.h_poly(a_ev, b_ev, c_ev)  # compile
        t0 = time.time()
        for _ in range(3):
            dh.h_poly(a_ev, b_ev, c_ev)
        out[f"hpoly_{ndev}dev_s"] = round((time.time() - t0) / 3, 3)

    out["msm_speedup_8dev"] = round(out["msm_1dev_s"] / out["msm_8dev_s"], 2)
    out["hpoly_speedup_8dev"] = round(
        out["hpoly_1dev_s"] / out["hpoly_8dev_s"], 2)
    out["note"] = ("virtual CPU mesh: validates sharding path + software "
                   "overhead only; ICI efficiency needs real multi-chip")
    print(json.dumps(out, indent=1))
    with open("/root/repo/SCALING_VMESH.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
