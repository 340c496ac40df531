"""Marlin stack tests: Poseidon, KZG10, AHP/SNARK roundtrip, universal
setup with NeedLargerBound (toy cycle)."""

import random

import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.gadgets.fp import fpvar_class
from pcd_tpu.r1cs.system import ConstraintSystem
from pcd_tpu.snark.api import NeedLargerBound
from pcd_tpu.snark.marlin.kzg import KZG10
from pcd_tpu.snark.marlin.native import MarlinBound, MarlinSNARK
from pcd_tpu.snark.marlin.poseidon import PoseidonSponge
from pcd_tpu.utils.rng import ChaChaRng

rng = random.Random(17)


class MulCircuit:
    def __init__(self, a=4, b=6):
        self.a, self.b = a, b

    def generate_constraints(self, cs):
        V = fpvar_class(cs)
        x = V.new_instance((self.a * self.b) % cs.p)
        a = V.new_witness(self.a)
        b = V.new_witness(self.b)
        (a * b).enforce_equal(x)
        (a * a).enforce_equal(V.new_witness(self.a * self.a))


def test_poseidon_native_vs_gadget():
    cfg = M.toy_mnt4()
    sp = PoseidonSponge(cfg.Fr)
    sp.absorb([cfg.Fr.from_int(i) for i in (7, 9, 11)])
    native = [e.n for e in sp.squeeze(3)]

    cs = ConstraintSystem(cfg.Fr)
    V = fpvar_class(cs)
    spv = PoseidonSponge(V)
    spv.absorb([V.new_witness(i) for i in (7, 9, 11)])
    gadget = [e.val for e in spv.squeeze(3)]
    assert native == gadget
    assert cs.is_satisfied()


def test_poseidon_absorb_squeeze_interleave():
    cfg = M.toy_mnt4()
    sp1 = PoseidonSponge(cfg.Fr)
    sp1.absorb([cfg.Fr.from_int(1)])
    a = sp1.squeeze(1)[0]
    sp1.absorb([cfg.Fr.from_int(2)])
    b = sp1.squeeze(1)[0]
    # differs from absorbing both first
    sp2 = PoseidonSponge(cfg.Fr)
    sp2.absorb([cfg.Fr.from_int(1), cfg.Fr.from_int(2)])
    c = sp2.squeeze(1)[0]
    assert b != c


def test_kzg_roundtrip_and_degree_bound():
    cfg = M.toy_mnt4()
    p = cfg.Fr.MODULUS
    kzg = KZG10(cfg)
    srs = kzg.setup(32, ChaChaRng(b"kzg test"))
    coeffs = [rng.randrange(p) for _ in range(20)]
    comm = kzg.commit(srs, coeffs, degree_bound=24)
    z = rng.randrange(p)
    y, pi = kzg.open(srs, coeffs, z)
    assert kzg.check(srs, comm, z, y, pi)
    assert not kzg.check(srs, comm, z, (y + 1) % p, pi)
    # shifted shadow commitment equals commit of X^(D-d) p(X)
    shifted_poly = [0] * (srs.max_degree - 24) + coeffs
    assert kzg.commit(srs, shifted_poly).c == comm.shifted


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_marlin_roundtrip(cfg_fn):
    cfg = cfg_fn()
    m = MarlinSNARK(cfg)
    crng = ChaChaRng(b"marlin roundtrip")
    pk, vk = m.circuit_specific_setup(MulCircuit(), crng)
    proof = m.prove(pk, MulCircuit(3, 7), crng)
    x = cfg.Fr.from_int(21)
    assert m.verify(vk, [x], proof)
    assert not m.verify(vk, [cfg.Fr.from_int(22)], proof)
    bad = proof.clone()
    bad.sigma3 = (bad.sigma3 + 1) % cfg.Fr.MODULUS
    assert not m.verify(vk, [x], bad)
    bad2 = proof.clone()
    bad2.evals = dict(proof.evals)
    bad2.evals["g_3A"] = (proof.evals["g_3A"] + 1) % cfg.Fr.MODULUS
    assert not m.verify(vk, [x], bad2)


def test_marlin_universal_setup_retry():
    """NeedLargerBound drives SRS resizing (the reference's
    UniversalSetupIndexError loop)."""
    cfg = M.toy_mnt4()
    m = MarlinSNARK(cfg)
    crng = ChaChaRng(b"universal")
    srs_small = m.universal_setup(MarlinBound(max_degree=4), crng)
    with pytest.raises(NeedLargerBound) as exc:
        m.index(srs_small, MulCircuit())
    bigger = exc.value.bound
    srs = m.universal_setup(bigger, crng)
    pk, vk = m.index(srs, MulCircuit())
    proof = m.prove(pk, MulCircuit(5, 5), crng)
    assert m.verify(vk, [cfg.Fr.from_int(25)], proof)


def test_marlin_proof_is_deterministic_per_rng():
    cfg = M.toy_mnt4()
    m = MarlinSNARK(cfg)
    pk, vk = m.circuit_specific_setup(MulCircuit(), ChaChaRng(b"det"))
    p1 = m.prove(pk, MulCircuit(), ChaChaRng(b"r"))
    p2 = m.prove(pk, MulCircuit(), ChaChaRng(b"r"))
    assert p1.sigma3 == p2.sigma3 and p1.evals == p2.evals


def test_marlin_zero_knowledge_masking():
    """Two proofs of the SAME statement with different rngs must differ in
    every witness-carrying component (the zk masking — reference's
    ark-marlin is zk, Cargo.toml:41), yet both verify.  Hiding degrees:
    deg-1 polynomial masks times v_H on zhat_A/B/C and zhat (via what) —
    two fresh dimensions per polynomial, covering the commitment's p(tau)
    and the beta_1 opening — plus the independent sumcheck mask s
    (deg n+1, sum_H s = 0) opened at beta_1."""
    cfg = M.toy_mnt4()
    m = MarlinSNARK(cfg)
    pk, vk = m.circuit_specific_setup(MulCircuit(), ChaChaRng(b"zk"))
    p1 = m.prove(pk, MulCircuit(3, 7), ChaChaRng(b"mask one"))
    p2 = m.prove(pk, MulCircuit(3, 7), ChaChaRng(b"mask two"))
    x = cfg.Fr.from_int(21)
    assert m.verify(vk, [x], p1)
    assert m.verify(vk, [x], p2)
    for nm in ("zhat_A", "zhat_B", "zhat_C", "what", "h_0", "s_mask"):
        assert p1.comms1[nm].c != p2.comms1[nm].c, f"comm {nm} not masked"
        assert p1.evals[nm] != p2.evals[nm], f"eval {nm} not masked"


@pytest.mark.slow
def test_marlin_universal_pcd_toy():
    """PCD-level universal setup -> index -> prove/verify (the reference's
    test_marlin_universal_pcd shape, tests/mnt4_marlin.rs:167-204).
    Heavy: the Marlin-gadget MainCircuit is ~90k constraints even on the
    toy cycle."""
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate

    class Counter(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    pcd = configs.toy_marlin()
    F = pcd.ic.main_field
    pred = Counter(F)
    rng = ChaChaRng(b"universal pcd")
    pp = pcd.universal_setup(MarlinBound(max_degree=16), rng)
    pk, vk = pcd.index(pp, pred, rng)
    one = F.from_int(1)
    p1 = pcd.prove(pk, pred, one, one, [], [], rng)
    assert pcd.verify(vk, pred, one, p1)
    two = F.from_int(2)
    p2 = pcd.prove(pk, pred, two, one, [one], [p1], rng)
    assert pcd.verify(vk, pred, two, p2)
    assert not pcd.verify(vk, pred, one, p2)


@pytest.mark.slow
def test_marlin_pcd_chain_toy():
    """Circuit-specific Marlin PCD chain on the toy cycle (reference
    test_marlin_pcd, tests/mnt4_marlin.rs:141-165)."""
    from pcd_tpu import configs
    from pcd_tpu.pcd.api import FpPredicate

    class Counter(FpPredicate):
        PRIOR_MSG_LEN = 1

        def generate_constraints(self, cs, msg, wit, priors, base):
            (priors[0] + wit).enforce_equal(msg)

    pcd = configs.toy_marlin()
    F = pcd.ic.main_field
    pred = Counter(F)
    rng = ChaChaRng(b"marlin pcd chain")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    one = F.from_int(1)
    p1 = pcd.prove(pk, pred, one, one, [], [], rng)
    assert pcd.verify(vk, pred, one, p1)
    two = F.from_int(2)
    p2 = pcd.prove(pk, pred, two, one, [one], [p1], rng)
    assert pcd.verify(vk, pred, two, p2)
    assert not pcd.verify(vk, pred, one, p2)
