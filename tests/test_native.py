"""C++ host runtime (pcd_tpu/native) vs the pure-Python oracles.

The native tier replaces what the reference gets from compiled Rust
(arkworks release builds): host MSM, fixed-base batches, and smooth-domain
NTTs.  Every op must match the Python implementations bit-for-bit."""

import random

import pytest

from pcd_tpu import native
from pcd_tpu.curves import models as M
from pcd_tpu.poly.domain import EvaluationDomain

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

rng = random.Random(1234)


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.mnt4_298, M.mnt6_298])
def test_native_msm_matches_python(cfg_fn):
    from pcd_tpu.msm.host import _native_curve_ok

    cfg = cfg_fn()
    r = cfg.g1.order
    for curve, gen in ((cfg.g1, cfg.g1_gen), (cfg.g2, cfg.g2_gen)):
        assert _native_curve_ok(curve)
        n = 48
        pts = [gen * rng.randrange(1, r) for _ in range(n)]
        pts[3] = curve.infinity()
        scalars = [rng.randrange(r) for _ in range(n)]
        scalars[0] = 0
        scalars[1] = r - 1
        # Python oracle (window method, native dispatch bypassed by size)
        acc = curve.infinity()
        for pt, s in zip(pts, scalars):
            acc = acc + pt * int(s)
        assert native.msm(pts, scalars) == acc


def test_native_fixed_base_matches_python():
    cfg = M.mnt4_298()
    r = cfg.g1.order
    for gen in (cfg.g1_gen, cfg.g2_gen):
        scalars = [rng.randrange(r) for _ in range(20)] + [0, 1, r - 1]
        out = native.fixed_base_batch(gen, scalars, cfg.Fr.BITS)
        for s, p in zip(scalars, out):
            assert p == gen * s


@pytest.mark.parametrize("F_fn", [lambda: M.toy_mnt4().Fr,
                                  lambda: M.mnt4_298().Fr,
                                  lambda: M.mnt6_298().Fr])
def test_native_ntt_matches_python(F_fn):
    F = F_fn()
    p = F.MODULUS
    for size in (16, 60, 384):
        dom = EvaluationDomain.new(F, size)
        n = dom.n
        vals = [rng.randrange(p) for _ in range(n)]
        # bypass dispatch (n < threshold uses Python anyway at these sizes)
        want = dom._fft_rec(list(vals), dom.omega)
        assert native.ntt(p, dom.omega, vals) == want
        ninv = pow(n, -1, p)
        winv = pow(dom.omega, -1, p)
        got_i = native.ntt(p, winv, vals, scale=ninv)
        want_i = [x * ninv % p for x in dom._fft_rec(list(vals), winv)]
        assert got_i == want_i


def test_native_dispatch_roundtrip_through_domain():
    """The dispatched (native) domain transforms must invert each other
    and match Python exactly across the threshold."""
    F = M.mnt4_298().Fr
    p = F.MODULUS
    dom = EvaluationDomain.new(F, 512)  # >= _NATIVE_MIN -> native path
    vals = [rng.randrange(p) for _ in range(dom.n)]
    assert dom.ifft(dom.fft(vals)) == vals
    assert dom.coset_ifft(dom.coset_fft(vals)) == vals
    want = dom._fft_rec(list(vals), dom.omega)
    assert dom.fft(vals) == want


def test_native_geom_scale():
    F = M.mnt4_298().Fr
    p = F.MODULUS
    g = 22
    vals = [rng.randrange(p) for _ in range(100)]
    got = native.geom_scale(p, g, vals)
    cur = 1
    for i, v in enumerate(vals):
        assert got[i] == v * cur % p
        cur = cur * g % p
