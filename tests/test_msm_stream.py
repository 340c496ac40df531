"""Stream MSM (ops/msm_stream.py) vs host oracles — toy cycle so the
f32 limb kernels compile in seconds on XLA-CPU (conftest forces CPU).

Covers the D4 prover hot loop (reference ark-groth16 prove MSMs,
ec_cycle_pcd/mod.rs:171,179): signed-digit correctness, scheduler
placement invariants (numpy and native C++ emitters), and the full
pipeline against a naive host sum with infinities / zero scalars /
duplicate points / r-1 scalars.
"""

import numpy as np
import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.ops.msm_stream import StreamMSMCtx


@pytest.fixture(scope="module")
def toy():
    return M.toy_cycle().main


@pytest.fixture(scope="module")
def sctx(toy):
    return StreamMSMCtx(toy.g1, toy.Fr.BITS, c=6, lanes=128)


def _points(toy, n):
    g = toy.g1_gen
    pts = []
    cur = g
    for _ in range(n):
        pts.append(cur)
        cur = cur + g
    return pts


def test_digits_signed_reconstruct(sctx, toy):
    r = toy.g1.order
    rng = np.random.default_rng(0)
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=23)]
    scalars += [0, 1, r - 1, r // 2]
    limbs = sctx.limb_rows(scalars, nbytes=8)
    mags, signs = sctx.digits_signed(limbs)
    for j, s in enumerate(scalars):
        v = 0
        for w in range(sctx.nwin):
            d = int(mags[w, j])
            if signs[w, j]:
                d = -d
            v += d << (w * sctx.c)
        assert v == s, f"digit recombination mismatch for scalar {j}"


def test_schedule_invariants(sctx, toy):
    """Every nonzero digit is placed exactly once; loads match; the
    direct bidx points at each nonempty bucket's first lane (sentinel
    elsewhere); runrem counts the lanes left in the lane's bucket
    segment and maxrun bounds every segment."""
    r = toy.g1.order
    rng = np.random.default_rng(1)
    n = 77
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    limbs = sctx.limb_rows(scalars, nbytes=8)
    mags, signs = sctx.digits_signed(limbs)
    inf = np.zeros(n, bool)
    inf[3] = True
    sched = sctx.schedule(mags, signs, inf)
    L = sctx.L
    perm = sched.perm_unpacked()
    SENT = sctx.nwin * L
    for w in range(sctx.nwin):
        mag = np.where(inf, 0, mags[w])
        # multiset of placed (point, sign) pairs == nonzero digits
        placed = {}
        for t in range(sched.T):
            for lane in range(L):
                if t < sched.loads[w, lane]:
                    v = int(perm[w, t, lane])
                    placed[(v & 0x7FFFFFFF, v >> 31)] = placed.get(
                        (v & 0x7FFFFFFF, v >> 31), 0) + 1
        expect = {}
        for i in range(n):
            if mag[i]:
                k = (i, int(signs[w, i]))
                expect[k] = expect.get(k, 0) + 1
        assert placed == expect, f"window {w} placement mismatch"
        assert int(sched.loads[w].sum()) == int((mag != 0).sum())
        # segment structure: lanes of one bucket fold only that bucket
        counts = np.bincount(mag, minlength=sctx.B + 1)[1:]
        starts = [int(sched.bidx[w, b]) - w * L
                  for b in range(sctx.B) if counts[b] > 0]
        assert starts == sorted(starts)
        for b in range(sctx.B):
            if counts[b] == 0:
                assert int(sched.bidx[w, b]) == SENT
        used = int(np.count_nonzero(sched.loads[w]))
        ends = starts[1:] + [used]
        for s0, e0 in zip(starts, ends):
            seglen = e0 - s0
            assert 1 <= seglen <= sched.maxrun
            for lane in range(s0, e0):
                assert int(sched.runrem[w, lane]) == e0 - lane
        # the lanes of bucket b hold exactly counts[b] points in total
        for bi, (s0, e0) in enumerate(zip(starts, ends)):
            assert int(sched.loads[w, s0:e0].sum()) > 0


def test_native_schedule_matches_numpy_semantics(sctx, toy):
    from pcd_tpu import native

    if not native.available():
        pytest.skip("native tier unavailable")
    r = toy.g1.order
    rng = np.random.default_rng(2)
    n = 130
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    limbs = np.ascontiguousarray(
        sctx.limb_rows(scalars, nbytes=8).astype("<u8"))
    out = native.msm_schedule(limbs, None, sctx.c, sctx.nwin, sctx.L,
                              sctx.B, carry_win=sctx.carry_win)
    assert out is not None
    perm, loads, bidx, T = out
    mags, signs = sctx.digits_signed(limbs)
    for w in range(sctx.nwin):
        nz = int((mags[w] != 0).sum())
        assert int(loads[w].sum()) == nz
        # every placed entry is a real (idx, sign) pair
        for t in range(T):
            for lane in range(sctx.L):
                if t < loads[w, lane]:
                    v = int(perm[w, t, lane])
                    i = v & 0x7FFFFFFF
                    assert mags[w, i] != 0
                    assert (v >> 31) == int(signs[w, i])


def test_msm_oracle_full(sctx, toy):
    r = toy.g1.order
    rng = np.random.default_rng(3)
    n = 61
    pts = _points(toy, n)
    pts[4] = toy.g1.infinity()
    pts[10] = pts[7]
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    scalars[0] = 0
    scalars[1] = r - 1
    scalars[2] = 1
    got = sctx.msm(pts, scalars)
    exp = toy.g1.infinity()
    for p, s in zip(pts, scalars):
        exp = exp + p * s
    assert got == exp


def test_carry_window_absorbed(toy):
    """When the top window has headroom (scalar_bits % c != 0) the
    signed carry is absorbed unsigned and the extra window disappears;
    at the divisible boundary the carry window must survive."""
    r = toy.g1.order
    bits = toy.Fr.BITS
    c = 6
    sc = StreamMSMCtx(toy.g1, bits, c=c, lanes=128)
    base = -(-bits // c)
    if bits % c:
        assert not sc.carry_win and sc.nwin == base
    sc2 = StreamMSMCtx(toy.g1, base * c, c=c, lanes=128)
    assert sc2.carry_win and sc2.nwin == base + 1
    rng = np.random.default_rng(9)
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=40)]
    scalars += [0, 1, r - 1]
    for ctx in (sc, sc2):
        limbs = ctx.limb_rows(scalars, nbytes=8)
        mags, signs = ctx.digits_signed(limbs)
        for j, s in enumerate(scalars):
            v = sum((-int(mags[w, j]) if signs[w, j] else int(mags[w, j]))
                    << (w * ctx.c) for w in range(ctx.nwin))
            assert v == s


def test_msm_all_zero_scalars(sctx, toy):
    pts = _points(toy, 9)
    got = sctx.msm(pts, [0] * 9)
    assert got.is_infinity()


def test_msm_more_points_than_lanes(toy):
    """n > lanes forces multi-round lanes (T > 1) and bucket collisions."""
    sctx = StreamMSMCtx(toy.g1, toy.Fr.BITS, c=4, lanes=128)
    r = toy.g1.order
    rng = np.random.default_rng(4)
    n = 300
    pts = _points(toy, n)
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    got = sctx.msm(pts, scalars)
    exp = toy.g1.infinity()
    for p, s in zip(pts, scalars):
        exp = exp + p * s
    assert got == exp


def test_schedule_reuse_across_tables_with_inf_flags(toy):
    """A schedule built WITHOUT infinity masking (in-table pad-limb
    flags handle them, ec32._rcb_maddT_ns) must be reusable across
    different tables — including an ext-coordinate G2 table — with its
    uploaded slices memoized on the schedule object.  This is the
    prover's a/b1/b2 one-schedule-per-z path (snark/msm_dispatch)."""
    import numpy as np

    from pcd_tpu.msm.host import msm as host_msm

    g1 = StreamMSMCtx(toy.g1, toy.Fr.BITS, c=6, lanes=128)
    g2 = StreamMSMCtx(toy.g2, toy.Fr.BITS, c=6, lanes=128)
    if not (g1.ec.fp.kp > g1.ec.fp.k):
        pytest.skip("no pad limb on this field")
    n = 61
    p1s = [toy.g1_gen * (i + 1) for i in range(n - 1)] \
        + [toy.g1.infinity()]
    p2s = [toy.g2_gen * (i + 2) for i in range(n)]
    rng = np.random.default_rng(9)
    r = toy.g1.order
    scalars = [int(x) % r for x in rng.integers(0, 1 << 62, size=n)]
    limbs = g1.limb_rows(scalars, (toy.Fr.BITS + 63) // 64 * 8)
    XY1, inf1 = g1.encode_table(p1s)
    XY2, inf2 = g2.encode_table(p2s)
    sched = g1.schedule_any(limbs, None)     # NO inf masking
    ws1 = g1.window_sums_async(XY1, sched)   # populates sched._dev
    ws2 = g2.window_sums_async(XY2, sched)   # reuses uploaded slices
    got1 = g1.horner_host(tuple(np.asarray(c) for c in ws1))
    got2 = g2.horner_host(tuple(np.asarray(c) for c in ws2))
    live1 = [(p, s) for p, s in zip(p1s, scalars)
             if s and not p.is_infinity()]
    assert got1 == host_msm([p for p, _ in live1],
                            [s for _, s in live1])
    assert got2 == host_msm(p2s, scalars)
