"""Witness-program compilation tests (r1cs/program.py + snark/plan.py):
synthesis is recorded once, later proofs replay a straight-line tape.
The reference has no counterpart (Rust synthesis is cheap, reference
src/ec_cycle_pcd/mod.rs:171,179 re-synthesizes per prove); replay must be
bit-identical to full re-synthesis."""

import pytest

from pcd_tpu import configs
from pcd_tpu.gadgets.fp import Boolean, fpvar_class
from pcd_tpu.r1cs.program import compile_witness_program
from pcd_tpu.r1cs.system import ConstraintSystem
from pcd_tpu.utils.rng import ChaChaRng


def _toy_field():
    from pcd_tpu.curves import models as M

    return M.toy_cycle().main.Fr


def _check_satisfied(cs, z):
    p = cs.p
    n_inst = cs.num_instance

    def ev(lc):
        acc = 0
        for v, c in lc.items():
            acc += c * z[n_inst + (-v - 1) if v < 0 else v]
        return acc % p

    for i, (a, b, c) in enumerate(cs.constraints):
        assert (ev(a) * ev(b) - ev(c)) % p == 0, f"constraint {i}"


def test_program_replay_basic_ops():
    """mul / inv / bits / iszero recipes replay correctly on new inputs."""
    F = _toy_field()
    cs = ConstraintSystem(F)
    V = fpvar_class(cs)

    x = V.new_instance(7)
    y = V.new_witness(11)
    prod = x * y
    prod.inv()
    bits = prod.to_bits_le()
    assert bits[0].value == (77 & 1 == 1)

    prog = compile_witness_program(cs)
    assert prog.record_ext == [7, 11]

    # replay with different inputs: derived values recompute
    z = prog.run([5, 9])
    p = F.MODULUS
    assert z[1] == 5
    # prod is the first derived witness
    prod_idx = cs.num_instance + 1
    assert z[prod_idx] == 45 % p
    assert z[prod_idx + 1] == pow(45, -1, p)
    _check_satisfied(cs, z)


def test_program_replay_boolean_and_select():
    F = _toy_field()
    cs = ConstraintSystem(F)
    V = fpvar_class(cs)
    a = V.new_witness(3)
    b = V.new_witness(4)
    c = Boolean.new_witness(V, True)
    cs.set_last_recipe(("iszero", (a - b + V.constant(1))._as_lc()))
    sel = c.select(a, b)
    sel * a  # touch a mul

    prog = compile_witness_program(cs)
    z = prog.run([10, 10])  # a - b + 1 != 0 -> c = 0 -> sel = b
    _check_satisfied(cs, z)


@pytest.mark.pcd_toy
def test_toy_pcd_chain_uses_replay():
    """A 3-step chain must hit the replay fast path from step 2 on, and the
    replayed proofs must verify (bit-identical witness => identical proof
    distribution)."""
    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    from tests.test_pcd import TestPredicate

    pred = TestPredicate(F)
    rng = ChaChaRng(b"pcd replay test")
    pk, vk = pcd.circuit_specific_setup(pred, rng)

    one = F.from_int(1)
    proof_1 = pcd.prove(pk, pred, one, one, [], [], rng)
    assert pcd.verify(vk, pred, one, proof_1)

    main_plan = getattr(pk.main_pk, "_plan", None)
    help_plan = getattr(pk.help_pk, "_plan", None)
    assert main_plan is not None, "MainCircuit witness program not compiled"
    assert help_plan is not None, "HelpCircuit witness program not compiled"

    val_2 = F.from_int(2)
    proof_2 = pcd.prove(pk, pred, val_2, one, [one], [proof_1], rng)
    assert pcd.verify(vk, pred, val_2, proof_2)
    assert main_plan.replay_count >= 1, "step 2 did not replay MainCircuit"
    assert help_plan.replay_count >= 1, "step 2 did not replay HelpCircuit"

    val_3 = F.from_int(3)
    proof_3 = pcd.prove(pk, pred, val_3, one, [val_2], [proof_2], rng)
    assert pcd.verify(vk, pred, val_3, proof_3)
    assert main_plan.replay_count >= 2
    assert not pcd.verify(vk, pred, one, proof_3)


@pytest.mark.pcd_toy
def test_toy_pcd_replay_rejects_bad_witness():
    """Replayed proving of an unsatisfiable statement must fail loudly."""
    from pcd_tpu.snark.api import SNARKError

    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    from tests.test_pcd import TestPredicate

    pred = TestPredicate(F)
    rng = ChaChaRng(b"pcd replay neg")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    one = F.from_int(1)
    proof_1 = pcd.prove(pk, pred, one, one, [], [], rng)  # compiles plan
    with pytest.raises(SNARKError):
        # msg=9 from prior 1 with witness 1 violates the predicate; the
        # prove runs through the replay path (plan exists)
        pcd.prove(pk, pred, F.from_int(9), one, [one], [proof_1], rng)
