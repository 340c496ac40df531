"""Device-scheduled stream MSM (ops/msm_stream_dev.py) vs host oracles
on the toy cycle (conftest forces CPU — the same jnp program runs on
TPU; the on-chip run is oracle-checked against the host-scheduled path
in the bench/profile scripts).

Reference parity: the prover MSM of Groth16/GM17/Marlin (ark-groth16
prove hot sites, ec_cycle_pcd/mod.rs:171,179).
"""

import numpy as np
import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.msm.host import msm as host_msm
from pcd_tpu.ops.msm_stream import StreamMSMCtx
from pcd_tpu.ops.msm_stream_dev import DevSchedMSM


@pytest.fixture(scope="module")
def toy():
    return M.toy_cycle().main


@pytest.fixture(scope="module")
def dm(toy):
    return DevSchedMSM(StreamMSMCtx(toy.g1, toy.Fr.BITS, c=6, lanes=128))


def _oracle(pts, scalars):
    live = [(p, s) for p, s in zip(pts, scalars)
            if s and not p.is_infinity()]
    if not live:
        return pts[0].curve.infinity()
    return host_msm([p for p, _ in live], [s for _, s in live])


def test_devsched_matches_host_with_edge_cases(toy, dm):
    g = toy.g1_gen
    n = 203
    pts = [g * (i + 1) for i in range(n - 2)] + [toy.g1.infinity(), g * 7]
    rng = np.random.default_rng(3)
    r = toy.g1.order
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    scalars[5] = 0
    scalars[6] = r - 1
    assert dm.msm(pts, scalars) == _oracle(pts, scalars)


def test_devsched_table_reuse_and_matches_host_sched(toy, dm):
    """Same table, fresh scalar vectors (pk-query reuse pattern); the
    device-scheduled and host-scheduled pipelines must agree exactly."""
    g = toy.g1_gen
    n = 64
    pts = [g * (i + 1) for i in range(n)]
    sctx = dm.sctx
    XY, inf = sctx.encode_table(pts)
    r = toy.g1.order
    nbytes = (toy.Fr.BITS + 63) // 64 * 8
    for seed in (1, 2):
        rng = np.random.default_rng(seed)
        scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
        limbs = sctx.limb_rows(scalars, nbytes)
        got = dm.msm_limbs(XY, limbs, inf)
        assert got == _oracle(pts, scalars)
        assert got == sctx.msm_limbs(XY, limbs, inf)


def test_devsched_low_entropy_scalars_skip_windows(toy, dm):
    """Small scalars leave high windows empty; those windows must cost
    nothing and the Horner tail must still weight them correctly."""
    g = toy.g1_gen
    n = 48
    pts = [g * (i + 1) for i in range(n)]
    scalars = [i % 7 for i in range(n)]      # only the lowest window
    assert dm.msm(pts, scalars) == _oracle(pts, scalars)


def test_devsched_all_zero_scalars(toy, dm):
    g = toy.g1_gen
    pts = [g * (i + 1) for i in range(16)]
    assert dm.msm(pts, [0] * 16).is_infinity()
