"""Pairing tests: bilinearity, non-degeneracy (reference behavior pinned by
SNARK verify use-sites, src/ec_cycle_pcd/mod.rs:239; SURVEY.md D6)."""

import random

import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.pairing.ate import pairing_for

rng = random.Random(1234)


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_bilinearity_toy(cfg_fn):
    cfg = cfg_fn()
    e = pairing_for(cfg)
    P, Q = cfg.g1_gen, cfg.g2_gen
    r = cfg.g1.order
    a = rng.randrange(1, r)
    b = rng.randrange(1, r)
    lhs = e.pairing(P * a, Q * b)
    rhs = e.pairing(P, Q) ** (a * b % r)
    assert lhs == rhs
    assert not lhs.is_one() or (a * b) % r == 0


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_nondegeneracy_and_order(cfg_fn):
    cfg = cfg_fn()
    e = pairing_for(cfg)
    g = e.pairing(cfg.g1_gen, cfg.g2_gen)
    assert not g.is_one()
    assert (g ** cfg.g1.order).is_one()


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_pairing_product(cfg_fn):
    cfg = cfg_fn()
    e = pairing_for(cfg)
    P, Q = cfg.g1_gen, cfg.g2_gen
    # e(P, Q) * e(-P, Q) == 1
    prod = e.multi_pairing([(P, Q), (-P, Q)])
    assert prod.is_one()


@pytest.mark.slow
@pytest.mark.parametrize("cfg_fn", [M.mnt4_298, M.mnt6_298])
def test_bilinearity_real(cfg_fn):
    cfg = cfg_fn()
    e = pairing_for(cfg)
    P, Q = cfg.g1_gen, cfg.g2_gen
    a, b = 12345678901234567890, 98765432109876543210
    lhs = e.pairing(P * a, Q * b)
    rhs = e.pairing(P, Q) ** (a * b)
    assert lhs == rhs
    assert not lhs.is_one()
