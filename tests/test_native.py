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


def test_native_msm_bucket_edge_cases():
    """Batch-affine bucket accumulation: repeated points (in-bucket
    doubling chains), P/-P cancellations (in-bucket infinity), infinity
    inputs, zero/equal scalars — all against the plain add oracle."""
    cfg = M.mnt4_298()
    g = cfg.g1_gen
    r = cfg.g1.order
    P = g * 7
    pts = [g, g, P, -P, g * 3, cfg.g1.infinity(), P, P, -P, g * 11] * 20
    choices = [0, 1, 2, (1 << 297) % r, rng.randrange(r), 5, 5, r - 1]
    scalars = [rng.choice(choices) for _ in pts]
    acc = cfg.g1.infinity()
    for pt, s in zip(pts, scalars):
        acc = acc + pt * s
    assert native.msm(pts, scalars) == acc
    # equal scalars: every bucket collision is a doubling chain
    s0 = 12345678901234567890 % r
    acc2 = cfg.g1.infinity()
    for pt in pts:
        acc2 = acc2 + pt * s0
    assert native.msm(pts, [s0] * len(pts)) == acc2


def test_native_spmat_apply():
    from pcd_tpu.native import SpMatrices

    F = M.mnt4_298().Fr
    p = F.MODULUS
    nvars = 40
    z = [rng.randrange(p) for _ in range(nvars)]
    rows = []
    for _ in range(25):
        def lc():
            return {rng.randrange(nvars): rng.randrange(p)
                    for _ in range(rng.randrange(1, 6))}
        rows.append((lc(), lc(), lc()))
    rows.append(({}, {0: 0}, {5: p - 1}))  # empty / zero-coeff rows
    mats = SpMatrices(p, rows, nrows=30)   # trailing zero rows
    az, bz, cz = mats.apply_all(z)
    for j, (ra, rb, rc) in enumerate(rows):
        assert az[j] == sum(co * z[col] for col, co in ra.items()) % p
        assert bz[j] == sum(co * z[col] for col, co in rb.items()) % p
        assert cz[j] == sum(co * z[col] for col, co in rc.items()) % p
    assert az[len(rows):] == [0] * (30 - len(rows))


def test_native_witness_replay_matches_python():
    """C++ wprog replay vs the Python interpreter on a program using
    mul/lc/bits/inv/iszero/inv0 recipes (cross-checked on fresh inputs,
    not just the recorded ones)."""
    from pcd_tpu.gadgets.fp import fpvar_class
    from pcd_tpu.native import WProgNative
    from pcd_tpu.r1cs.program import compile_witness_program
    from pcd_tpu.r1cs.system import ConstraintSystem

    F = M.mnt4_298().Fr
    cs = ConstraintSystem(F)
    V = fpvar_class(cs)
    x = V.new_witness(123456789)
    y = V.new_witness(987654321)
    prod = x * y
    inv = prod.inv()
    (prod * inv).enforce_equal(V.constant(1))
    bits = x.to_bits_le(64)
    z_flag = (x - y).is_zero()
    acc = y
    for b in bits[:5]:
        acc = acc + b.fp
    acc.enforce_equal(V.new_witness(acc.val))
    prog = compile_witness_program(cs)  # self-check runs the native tier
    nat = WProgNative.compile(prog)
    assert nat is not None
    # fresh external inputs: replay native vs Python interpreter
    ext = [v * 3 + 1 for v in prog.record_ext]
    got = nat.run(ext)
    prog_native, prog._native = prog._native, None  # force Python
    want = prog.run(ext)
    prog._native = prog_native
    assert got == want
