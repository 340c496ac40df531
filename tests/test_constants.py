"""Property-verification of all curve constants (see provenance notes in
pcd_tpu/fields/constants.py).  Mirrors the trust anchors the reference gets
from its pinned arkworks curve crates (Cargo.toml:31-34)."""

import random

import pytest

from pcd_tpu.fields import constants as C
from pcd_tpu.curves import models as M


def miller_rabin(n, k=30, _r=random.Random(99)):
    if n < 2:
        return False
    for p in [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(k):
        a = _r.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@pytest.mark.parametrize("q,r,k", [
    (C.MNT4_Q, C.MNT4_R, 4),
    (C.MNT6_Q, C.MNT6_R, 6),
    (C.TOY_MNT4_Q, C.TOY_MNT4_R, 4),
    (C.TOY_MNT6_Q, C.TOY_MNT6_R, 6),
])
def test_cycle_primes_and_embedding(q, r, k):
    assert miller_rabin(q) and miller_rabin(r)
    if k == 4:
        assert (q * q + 1) % r == 0
    else:
        assert (q * q - q + 1) % r == 0
    # Hasse bound on the trace
    t = q + 1 - r
    assert t * t <= 4 * q


def test_cycle_pairing():
    assert C.MNT6_Q == C.MNT4_R and C.MNT6_R == C.MNT4_Q
    assert C.TOY_MNT6_Q == C.TOY_MNT4_R and C.TOY_MNT6_R == C.TOY_MNT4_Q


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_toy_g1_generators(cfg_fn):
    cfg = cfg_fn()
    g = cfg.g1_gen
    assert g.is_on_curve()
    assert (g * cfg.g1.order).is_infinity()
    assert not (g * 1).is_infinity()


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_toy_g2_generators(cfg_fn):
    cfg = cfg_fn()
    g = cfg.g2_gen
    assert g.is_on_curve()
    assert (g * cfg.g2.order).is_infinity()
    assert not g.is_infinity()


@pytest.mark.slow
@pytest.mark.parametrize("cfg_fn", [M.mnt4_298, M.mnt6_298])
def test_real_generators(cfg_fn):
    cfg = cfg_fn()
    assert cfg.g1_gen.is_on_curve()
    assert (cfg.g1_gen * cfg.g1.order).is_infinity()
    assert cfg.g2_gen.is_on_curve()
    assert (cfg.g2_gen * cfg.g2.order).is_infinity()


def test_te_curves_complete():
    for te in (M.toy_te(), M.ed_on_mnt4_298(), M.jubjub()):
        assert te.a.is_square(), te.name
        assert not te.d.is_square(), te.name


def test_toy_te_order():
    te = M.toy_te()
    g = te.point_ints(*C.TOY_TE_G)
    assert (g * te.order).is_identity()
    assert not (g * 1).is_identity()


@pytest.mark.slow
def test_ed_mnt4_order():
    te = M.ed_on_mnt4_298()
    g = te.point_ints(*C.ED_MNT4_G)
    assert (g * te.order).is_identity()
    assert not (g * 1).is_identity()


@pytest.mark.slow
def test_jubjub_order():
    te = M.jubjub()
    p = te.rand_point(random.Random(5))
    assert (p * te.order).is_identity()
