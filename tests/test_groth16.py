"""Groth16 native end-to-end tests on the toy cycle."""

import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.gadgets.fp import fpvar_class
from pcd_tpu.snark.api import SNARKError
from pcd_tpu.snark.groth16.native import Groth16
from pcd_tpu.utils.rng import ChaChaRng


class MulCircuit:
    """x (public) = a * b + c (witnesses); a few extra constraints."""

    def __init__(self, a=3, b=5, c=7):
        self.a, self.b, self.c = a, b, c

    def generate_constraints(self, cs):
        V = fpvar_class(cs)
        x = V.new_instance((self.a * self.b + self.c) % cs.p)
        a = V.new_witness(self.a)
        b = V.new_witness(self.b)
        c = V.new_witness(self.c)
        (a * b + c).enforce_equal(x)
        # some padding structure
        d = a * a
        (d * b).enforce_equal(V.new_witness(self.a * self.a * self.b))


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_groth16_roundtrip(cfg_fn):
    cfg = cfg_fn()
    g16 = Groth16(cfg)
    rng = ChaChaRng(b"groth16 test")
    pk, vk = g16.circuit_specific_setup(MulCircuit(), rng)
    proof = g16.prove(pk, MulCircuit(4, 6, 1), rng)
    x = cfg.Fr.from_int(4 * 6 + 1)
    assert g16.verify(vk, [x], proof)
    # wrong public input fails
    assert not g16.verify(vk, [cfg.Fr.from_int(26)], proof)
    # tampered proof fails
    bad = proof.clone()
    bad.a = bad.a + cfg.g1_gen
    assert not g16.verify(vk, [x], bad)


def test_groth16_unsatisfied_raises():
    cfg = M.toy_mnt4()
    g16 = Groth16(cfg)
    rng = ChaChaRng(b"groth16 test2")
    pk, vk = g16.circuit_specific_setup(MulCircuit(), rng)

    class Lying(MulCircuit):
        def generate_constraints(self, cs):
            V = fpvar_class(cs)
            x = V.new_instance(999)  # wrong public value
            a = V.new_witness(self.a)
            b = V.new_witness(self.b)
            c = V.new_witness(self.c)
            # force the enforce to be violated by lying about the product
            prod = V.new_witness(123)
            cs.enforce(a.lc, b.lc, prod.lc)
            (prod + c).enforce_equal(x)
            d = a * a
            (d * b).enforce_equal(V.new_witness(0))

    with pytest.raises(SNARKError):
        g16.prove(pk, Lying(), rng)


def test_groth16_proof_randomization():
    """Same witness, different rng -> different proofs, both verify."""
    cfg = M.toy_mnt4()
    g16 = Groth16(cfg)
    pk, vk = g16.circuit_specific_setup(MulCircuit(), ChaChaRng(b"s"))
    p1 = g16.prove(pk, MulCircuit(), ChaChaRng(b"r1"))
    p2 = g16.prove(pk, MulCircuit(), ChaChaRng(b"r2"))
    x = cfg.Fr.from_int(3 * 5 + 7)
    assert g16.verify(vk, [x], p1) and g16.verify(vk, [x], p2)
    assert p1.a != p2.a


def test_groth16_many_inputs():
    cfg = M.toy_mnt6()
    g16 = Groth16(cfg)

    class ManyInputs:
        def generate_constraints(self, cs):
            V = fpvar_class(cs)
            xs = [V.new_instance(i + 1) for i in range(5)]
            w = V.new_witness(120)
            prod = V.one()
            for x in xs:
                prod = prod * x
            prod.enforce_equal(w)

    rng = ChaChaRng(b"many")
    pk, vk = g16.circuit_specific_setup(ManyInputs(), rng)
    proof = g16.prove(pk, ManyInputs(), rng)
    xs = [cfg.Fr.from_int(i + 1) for i in range(5)]
    assert g16.verify(vk, xs, proof)
    xs[2] = cfg.Fr.from_int(9)
    assert not g16.verify(vk, xs, proof)


@pytest.mark.heavy
def test_groth16_device_backend_matches():
    """Force the device data plane on a toy circuit; proofs must verify and
    interop with host-generated keys must hold."""
    cfg = M.toy_mnt4()
    g16 = Groth16(cfg, backend="device")
    rng = ChaChaRng(b"devbackend")
    pk, vk = g16.circuit_specific_setup(MulCircuit(), rng)
    proof = g16.prove(pk, MulCircuit(4, 6, 1), rng)
    x = cfg.Fr.from_int(25)
    assert g16.verify(vk, [x], proof)
    assert not g16.verify(vk, [cfg.Fr.from_int(26)], proof)

    # same-seed host setup must produce identical vk elements
    g16h = Groth16(cfg, backend="host")
    pkh, vkh = g16h.circuit_specific_setup(MulCircuit(), ChaChaRng(b"devbackend"))
    assert vkh.alpha_g1 == vk.alpha_g1
    assert vkh.gamma_abc == vk.gamma_abc
    # cross: device proof verifies under host-derived vk
    assert g16h.verify(vkh, [x], proof)
