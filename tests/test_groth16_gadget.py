"""In-circuit pairing + Groth16 verifier gadget tests (toy cycle).

Strategy mirrors the reference's native-vs-gadget pattern: the gadget's
value trace must equal the host oracle, and the CS must be satisfiable;
flipping the verified statement must flip the Boolean."""

import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.gadgets.fields_ext import circuit_tower
from pcd_tpu.gadgets.fp import fpvar_class
from pcd_tpu.gadgets.pairing import PairingGadget
from pcd_tpu.gadgets.sw import AffinePointVar
from pcd_tpu.pairing.ate import pairing_for
from pcd_tpu.r1cs.system import ConstraintSystem
from pcd_tpu.snark.groth16.gadget import Groth16VerifierGadget
from pcd_tpu.snark.groth16.native import Groth16
from pcd_tpu.utils.rng import ChaChaRng


def _pairing_gadget_matches_host(inner_cfg):
    """Verify the in-circuit Miller loop + final exp against the host."""
    cs = ConstraintSystem(inner_cfg.Fq)
    V = fpvar_class(cs)
    tower = circuit_tower(cs, inner_cfg)
    pg = PairingGadget(cs, inner_cfg)
    host = pairing_for(inner_cfg)

    P = inner_cfg.g1_gen * 5
    Q = inner_cfg.g2_gen * 7
    Pv = AffinePointVar.alloc(inner_cfg.g1, P, lambda e: V.new_witness(e.n))
    Qv = AffinePointVar.alloc(inner_cfg.g2, Q, tower.lift_half_witness)

    f = pg.miller_loop(Pv, Qv)
    assert tower.k_value(f) == host.miller_loop(P, Q)
    out = pg.final_exponentiation(f)
    assert tower.k_value(out) == host.pairing(P, Q)
    assert cs.is_satisfied()
    return cs.num_constraints


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_pairing_gadget_matches_host(cfg_fn):
    n = _pairing_gadget_matches_host(cfg_fn())
    assert n > 0


@pytest.mark.parametrize("cfg_fn", [M.toy_mnt4, M.toy_mnt6])
def test_pairing_product_boolean(cfg_fn):
    cfg = cfg_fn()
    cs = ConstraintSystem(cfg.Fq)
    V = fpvar_class(cs)
    tower = circuit_tower(cs, cfg)
    pg = PairingGadget(cs, cfg)
    P, Q = cfg.g1_gen * 3, cfg.g2_gen * 11
    mkP = lambda pt: AffinePointVar.alloc(cfg.g1, pt, lambda e: V.new_witness(e.n))
    mkQ = lambda pt: AffinePointVar.alloc(cfg.g2, pt, tower.lift_half_witness)
    # e(P,Q) * e(-P,Q) == 1
    good = pg.product_of_pairings_is_one([(mkP(P), mkQ(Q)), (mkP(-P), mkQ(Q))])
    assert good.value is True
    # e(P,Q) * e(2P,Q) != 1
    bad = pg.product_of_pairings_is_one([(mkP(P), mkQ(Q)), (mkP(P * 2), mkQ(Q))])
    assert bad.value is False
    assert cs.is_satisfied()


class MulCircuit:
    def __init__(self, a=3, b=5):
        self.a, self.b = a, b

    def generate_constraints(self, cs):
        V = fpvar_class(cs)
        x = V.new_instance((self.a * self.b) % cs.p)
        a = V.new_witness(self.a)
        b = V.new_witness(self.b)
        (a * b).enforce_equal(x)


@pytest.mark.parametrize("role", ["main_in_help", "help_in_main"])
def test_groth16_verifier_gadget(role):
    """Prove with Groth16 over one toy curve; verify the proof in-circuit
    over the partner field — the core recursion step."""
    cyc = M.toy_cycle()
    inner = cyc.main if role == "main_in_help" else cyc.help
    outer_field = inner.Fq  # == partner's Fr

    g16 = Groth16(inner)
    rng = ChaChaRng(b"gadget test")
    pk, vk = g16.circuit_specific_setup(MulCircuit(), rng)
    proof = g16.prove(pk, MulCircuit(4, 6), rng)
    x = inner.Fr.from_int(24)
    assert g16.verify(vk, [x], proof)

    gadget = Groth16VerifierGadget(inner)

    # witness-vk path (MainCircuit style)
    cs = ConstraintSystem(outer_field)
    vk_var = gadget.alloc_vk(cs, vk, mode="witness")
    proof_var = gadget.alloc_proof(cs, proof)
    input_var = gadget.input_var_new_input(cs, [x])
    ok = gadget.verify(cs, vk_var, input_var, proof_var)
    assert ok.value is True
    assert cs.is_satisfied()
    n_witness_path = cs.num_constraints

    # wrong input -> Boolean false, still satisfiable
    cs2 = ConstraintSystem(outer_field)
    vk_var2 = gadget.alloc_vk(cs2, vk, mode="witness")
    proof_var2 = gadget.alloc_proof(cs2, proof)
    bad_input = gadget.input_var_new_input(cs2, [inner.Fr.from_int(25)])
    ok2 = gadget.verify(cs2, vk_var2, bad_input, proof_var2)
    assert ok2.value is False
    assert cs2.is_satisfied()

    # processed-vk path (HelpCircuit style)
    pvk = g16.process_vk(vk)
    cs3 = ConstraintSystem(outer_field)
    pvk_var = gadget.alloc_pvk(cs3, pvk)
    proof_var3 = gadget.alloc_proof(cs3, proof)
    input_var3 = gadget.input_var_new_input(cs3, [x])
    ok3 = gadget.verify_with_processed_vk(cs3, pvk_var, input_var3, proof_var3)
    assert ok3.value is True
    assert cs3.is_satisfied()
    assert cs3.num_constraints < n_witness_path  # constants fold


def test_vk_bytes_native_matches_gadget():
    cyc = M.toy_cycle()
    inner = cyc.help
    g16 = Groth16(inner)
    rng = ChaChaRng(b"vkbytes")
    _, vk = g16.circuit_specific_setup(MulCircuit(), rng)
    gadget = Groth16VerifierGadget(inner)
    native = gadget.vk_bytes_native(vk)

    cs = ConstraintSystem(inner.Fq)
    vk_var = gadget.alloc_vk(cs, vk, mode="witness")
    gadget_bytes = bytes(b.value for b in gadget.vk_to_bytes(vk_var))
    assert native == gadget_bytes
    assert len(native) > 0


def test_pairing_gadget_degenerate_inputs_diagnosable():
    """Completeness caveat pinned (VERDICT r2 item 10; mirrors the
    reference's new_verification_key_unchecked skip-subgroup-checks caveat,
    data_structures.rs:153-162): degenerate pairing-gadget inputs must be
    DIAGNOSABLE — a SynthesisError or a False verification boolean — never
    a silently-true result.

    - a G2 input at infinity (zero coords, the placeholder-proof shape)
      hits a zero slope-denominator inverse -> SynthesisError
    - the affine allocator refuses infinity outright
    - a (0, 0)-shaped G1 input yields a False pairing-product boolean
    """
    from pcd_tpu.r1cs.system import SynthesisError

    cfg = M.toy_mnt4()
    cs = ConstraintSystem(cfg.Fq)
    V = fpvar_class(cs)
    tower = circuit_tower(cs, cfg)
    pg = PairingGadget(cs, cfg)
    P, Q = cfg.g1_gen * 3, cfg.g2_gen * 11
    mkP = lambda pt: AffinePointVar.alloc(cfg.g1, pt,
                                          lambda e: V.new_witness(e.n))
    mkQ = lambda pt: AffinePointVar.alloc(cfg.g2, pt,
                                          tower.lift_half_witness)

    # 1. the allocator refuses infinity
    with pytest.raises(AssertionError):
        AffinePointVar.alloc(cfg.g1, cfg.g1.infinity(),
                             lambda e: V.new_witness(e.n))

    # 2. G2 "infinity" smuggled in as raw (0, 0) coords: the first
    # doubling's slope denominator 2y is zero -> diagnosable SynthesisError
    half_zero = cfg.g2.F.zero()
    q_inf = AffinePointVar(cfg.g2, tower.lift_half_witness(half_zero),
                           tower.lift_half_witness(half_zero))
    with pytest.raises(SynthesisError):
        pg.miller_loop(mkP(P), q_inf)

    # 3. G1 (0, 0) coords: wrong pairing value, but the product boolean is
    # False — the verification equation rejects rather than accepts
    zero = V.new_witness(0)
    p_zero = AffinePointVar(cfg.g1, zero, zero)
    out = pg.product_of_pairings_is_one([(p_zero, mkQ(Q)), (mkP(-P), mkQ(Q))])
    assert out.value is False
