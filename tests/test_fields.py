"""Host field layer tests: prime fields, towers, frobenius, sqrt."""

import random

import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.fields.prime import make_prime_field
from pcd_tpu.fields.tower import make_ext_field

rng = random.Random(42)


@pytest.fixture(params=["toy4", "toy6", "mnt4", "mnt6"])
def cfg(request):
    return {
        "toy4": M.toy_mnt4, "toy6": M.toy_mnt6,
        "mnt4": M.mnt4_298, "mnt6": M.mnt6_298,
    }[request.param]()


def test_prime_field_basics():
    F = make_prime_field(318836737, "Ftest")
    a, b = F.rand(rng), F.rand(rng)
    assert (a + b) - b == a
    assert a * b == b * a
    assert (a * b) * a.inv() == b if not a.is_zero() else True
    assert a ** 3 == a * a * a
    c = F.from_int(0)
    with pytest.raises(ZeroDivisionError):
        c.inv()


def test_field_bytes_roundtrip():
    F = M.mnt4_298().Fq
    a = F.rand(rng)
    b = F.from_bytes(a.to_bytes())
    assert a == b
    # arkworks LE-limb layout: 40 bytes for 298-bit fields
    assert len(a.to_bytes()) == 40


def test_bits_le():
    F = M.toy_mnt4().Fq
    a = F.rand(rng)
    bits = a.to_bits_le()
    assert F.from_bits_le(bits) == a
    assert len(bits) == F.BITS


def test_sqrt_prime():
    F = M.mnt4_298().Fr
    for _ in range(5):
        a = F.rand(rng)
        sq = a * a
        r = sq.sqrt()
        assert r is not None and r * r == sq


def test_tower_arithmetic(cfg):
    for E in (cfg.Fq_half, cfg.Fq_k):
        a, b, c = E.rand(rng), E.rand(rng), E.rand(rng)
        assert (a + b) * c == a * c + b * c
        assert a * b == b * a
        if not a.is_zero():
            assert a * a.inv() == E.one()
        assert a ** 5 == a * a * a * a * a


def test_frobenius(cfg):
    p = cfg.Fq.MODULUS
    for E in (cfg.Fq_half, cfg.Fq_k):
        a = E.rand(rng)
        assert a.frobenius(1) == a ** p
        k = E.extension_degree_over_prime()
        assert a.frobenius(k) == a  # identity after full cycle
        assert a.frobenius(1).frobenius(1) == a.frobenius(2)


def test_tower_flatten(cfg):
    E = cfg.Fq_k
    a = E.rand(rng)
    coeffs = a.to_prime_coeffs()
    assert len(coeffs) == E.extension_degree_over_prime()
    assert E.from_prime_coeffs(coeffs) == a


def test_ext_sqrt():
    E = M.toy_mnt4().Fq_half
    a = E.rand(rng)
    sq = a * a
    r = sq.sqrt()
    assert r is not None and r * r == sq
