"""Distributed STREAM MSM (parallel/stream_dist.py) vs the host oracle
on the 8-device virtual mesh (SURVEY.md §2c D4 first-class distributed
component; VERDICT r4 item 4 — the mesh must shard the production stream
architecture, not the legacy scan path).

Reference parity: prover MSMs of Groth16/GM17 (hot call sites
ec_cycle_pcd/mod.rs:171,179); the reference is single-process rayon.
"""

import numpy as np
import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.msm.host import msm as host_msm
from pcd_tpu.parallel.mesh import make_mesh
from pcd_tpu.parallel.stream_dist import ShardedStreamMSM


@pytest.fixture(scope="module")
def toy():
    return M.toy_cycle().main


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _oracle(pts, scalars):
    live = [(p, s) for p, s in zip(pts, scalars)
            if s and not p.is_infinity()]
    if not live:
        return pts[0].curve.infinity()
    return host_msm([p for p, _ in live], [s for _, s in live])


def test_sharded_stream_g1_matches_host(toy, mesh):
    smsm = ShardedStreamMSM(toy.g1, toy.Fr.BITS, mesh, c=6, lanes=128)
    g = toy.g1_gen
    n = 203  # deliberately NOT a multiple of the device count
    pts = [g * (i + 1) for i in range(n - 2)] + [toy.g1.infinity(), g * 7]
    rng = np.random.default_rng(3)
    r = toy.g1.order
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    scalars[5] = 0
    scalars[6] = r - 1
    assert smsm.msm(pts, scalars) == _oracle(pts, scalars)


def test_sharded_stream_g1_table_reuse(toy, mesh):
    """Same sharded table, different scalar vectors (the pk-query reuse
    pattern) — exercises the schedule/jit caches across calls."""
    smsm = ShardedStreamMSM(toy.g1, toy.Fr.BITS, mesh, c=6, lanes=128)
    g = toy.g1_gen
    n = 64
    pts = [g * (i + 1) for i in range(n)]
    XY, infs = smsm.encode_table(pts)
    r = toy.g1.order
    nbytes = (toy.Fr.BITS + 63) // 64 * 8
    for seed in (1, 2):
        rng = np.random.default_rng(seed)
        scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
        limbs = smsm.sctx.limb_rows(scalars, nbytes)
        assert smsm.msm_limbs(XY, limbs, infs) == _oracle(pts, scalars)


@pytest.mark.heavy
def test_sharded_stream_g2_ext_matches_host(toy, mesh):
    """Fp2/Fp3 coordinate (G2) shards through the same pipeline."""
    smsm = ShardedStreamMSM(toy.g2, toy.Fr.BITS, mesh, c=6, lanes=128)
    g = toy.g2_gen
    n = 96
    pts = [g * (i + 1) for i in range(n)]
    rng = np.random.default_rng(4)
    r = toy.g2.order
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    assert smsm.msm(pts, scalars) == _oracle(pts, scalars)


def test_dist_context_routes_stream(toy, mesh):
    """DistContext.stream_msm (the DistContext production MSM route)."""
    from pcd_tpu.parallel.dist import DistContext

    dctx = DistContext(mesh)
    g = toy.g1_gen
    n = 40
    pts = [g * (i + 1) for i in range(n)]
    rng = np.random.default_rng(5)
    r = toy.g1.order
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    got = dctx.stream_msm(toy.g1, toy.Fr.BITS, pts, scalars)
    assert got == _oracle(pts, scalars)
    # second call reuses the cached table + compiled program
    scalars2 = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    assert dctx.stream_msm(toy.g1, toy.Fr.BITS, pts, scalars2) \
        == _oracle(pts, scalars2)
