"""GM17 native + gadget tests (toy cycle), mirroring the Groth16 test
shapes; plus PCD chains for gm17 and both mixed SNARK configs (the
framework counterpart of tests/mnt4_gm17.rs and tests/mnt4_mix_*.rs)."""

import pytest

from pcd_tpu import configs
from pcd_tpu.curves import models as M
from pcd_tpu.gadgets.fp import fpvar_class
from pcd_tpu.pcd.api import FpPredicate
from pcd_tpu.r1cs.system import ConstraintSystem
from pcd_tpu.snark.gm17.gadget import GM17VerifierGadget
from pcd_tpu.snark.gm17.native import GM17
from pcd_tpu.utils.rng import ChaChaRng


class MulCircuit:
    def __init__(self, a=3, b=5):
        self.a, self.b = a, b

    def generate_constraints(self, cs):
        V = fpvar_class(cs)
        x = V.new_instance((self.a * self.b) % cs.p)
        a = V.new_witness(self.a)
        b = V.new_witness(self.b)
        (a * b).enforce_equal(x)
        (a + b).enforce_equal(V.new_witness(self.a + self.b))


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_gm17_roundtrip(cfg_fn):
    cfg = cfg_fn()
    gm = GM17(cfg)
    rng = ChaChaRng(b"gm17 test")
    pk, vk = gm.circuit_specific_setup(MulCircuit(), rng)
    proof = gm.prove(pk, MulCircuit(4, 6), rng)
    x = cfg.Fr.from_int(24)
    assert gm.verify(vk, [x], proof)
    assert not gm.verify(vk, [cfg.Fr.from_int(25)], proof)
    bad = proof.clone()
    bad.a = bad.a + cfg.g1_gen
    assert not gm.verify(vk, [x], bad)
    # swap b for a mismatched-exponent attack: eq2 must catch it
    proof2 = gm.prove(pk, MulCircuit(4, 6), ChaChaRng(b"other"))
    frank = proof.clone()
    frank.b = proof2.b
    assert not gm.verify(vk, [x], frank)


def test_gm17_verifier_gadget():
    cyc = M.toy_cycle()
    inner = cyc.help
    gm = GM17(inner)
    rng = ChaChaRng(b"gm17 gadget")
    pk, vk = gm.circuit_specific_setup(MulCircuit(), rng)
    proof = gm.prove(pk, MulCircuit(4, 6), rng)
    x = inner.Fr.from_int(24)
    assert gm.verify(vk, [x], proof)

    gadget = GM17VerifierGadget(inner)
    cs = ConstraintSystem(inner.Fq)
    vk_var = gadget.alloc_vk(cs, vk, "witness")
    pf_var = gadget.alloc_proof(cs, proof)
    iv = gadget.input_var_new_input(cs, [x])
    ok = gadget.verify(cs, vk_var, iv, pf_var)
    assert ok.value is True
    assert cs.is_satisfied()

    # wrong input: Boolean False but satisfiable
    cs2 = ConstraintSystem(inner.Fq)
    vk2 = gadget.alloc_vk(cs2, vk, "witness")
    pf2 = gadget.alloc_proof(cs2, proof)
    iv2 = gadget.input_var_new_input(cs2, [inner.Fr.from_int(23)])
    assert gadget.verify(cs2, vk2, iv2, pf2).value is False
    assert cs2.is_satisfied()

    # processed-vk path
    pvk = gm.process_vk(vk)
    cs3 = ConstraintSystem(inner.Fq)
    pvk_var = gadget.alloc_pvk(cs3, pvk)
    pf3 = gadget.alloc_proof(cs3, proof)
    iv3 = gadget.input_var_new_input(cs3, [x])
    assert gadget.verify_with_processed_vk(cs3, pvk_var, iv3, pf3).value is True
    assert cs3.is_satisfied()


class CounterPredicate(FpPredicate):
    PRIOR_MSG_LEN = 1

    def generate_constraints(self, cs, msg, wit, priors, base):
        (priors[0] + wit).enforce_equal(msg)


@pytest.mark.pcd_toy
@pytest.mark.parametrize("mk", [configs.toy_gm17, configs.toy_mix_groth16_gm17,
                                configs.toy_mix_gm17_groth16])
def test_toy_pcd_chain_gm17_and_mixed(mk):
    pcd = mk()
    F = pcd.ic.main_field
    pred = CounterPredicate(F)
    rng = ChaChaRng(b"pcd gm17 mix")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    one = F.from_int(1)
    p1 = pcd.prove(pk, pred, one, one, [], [], rng)
    assert pcd.verify(vk, pred, one, p1)
    two = F.from_int(2)
    p2 = pcd.prove(pk, pred, two, one, [one], [p1], rng)
    assert pcd.verify(vk, pred, two, p2)
    assert not pcd.verify(vk, pred, one, p2)


def test_gm17_device_backend():
    cfg = M.toy_mnt4()
    gm = GM17(cfg, backend="device")
    rng = ChaChaRng(b"gm17 dev")
    pk, vk = gm.circuit_specific_setup(MulCircuit(), rng)
    proof = gm.prove(pk, MulCircuit(4, 6), rng)
    x = cfg.Fr.from_int(24)
    assert gm.verify(vk, [x], proof)
    # same-seed host setup -> identical vk
    gmh = GM17(cfg, backend="host")
    pkh, vkh = gmh.circuit_specific_setup(MulCircuit(), ChaChaRng(b"gm17 dev"))
    assert vkh.alpha_g1 == vk.alpha_g1 and vkh.query == vk.query
    assert gmh.verify(vkh, [x], proof)
