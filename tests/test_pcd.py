"""End-to-end PCD/IVC tests on the toy cycle — the framework's counterpart
of the reference integration tests (tests/mnt4_groth16.rs:77-121): a 3-step
counter IVC chain (msg = prior_msg + witness) ending with a negative check.
"""

import pytest

from pcd_tpu import configs
from pcd_tpu.gadgets.fp import fpvar_class
from pcd_tpu.pcd.api import FpPredicate
from pcd_tpu.utils.rng import ChaChaRng


class TestPredicate(FpPredicate):
    """msg == prior_msg + witness (reference tests/mnt4_groth16.rs:52-73)."""

    __test__ = False  # not a pytest class
    PRIOR_MSG_LEN = 1

    def generate_constraints(self, cs, msg_var, witness_var, prior_msg_vars,
                             base_case_bool):
        assert len(prior_msg_vars) == self.PRIOR_MSG_LEN
        supposed = prior_msg_vars[0] + witness_var
        supposed.enforce_equal(msg_var)


@pytest.mark.pcd_toy
def test_toy_groth16_pcd_chain():
    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = TestPredicate(F)
    rng = ChaChaRng(b"pcd toy test")

    pk, vk = pcd.circuit_specific_setup(pred, rng)

    one = F.from_int(1)
    # base case: msg = 1 with witness 1 (prior defaults to 0)
    proof_1 = pcd.prove(pk, pred, one, one, [], [], rng)
    assert pcd.verify(vk, pred, one, proof_1)

    # step 2
    val_2 = F.from_int(2)
    proof_2 = pcd.prove(pk, pred, val_2, one, [one], [proof_1], rng)
    assert pcd.verify(vk, pred, val_2, proof_2)

    # step 3
    val_3 = F.from_int(3)
    proof_3 = pcd.prove(pk, pred, val_3, one, [val_2], [proof_2], rng)
    assert pcd.verify(vk, pred, val_3, proof_3)

    # negative: old message against newest proof must fail
    assert not pcd.verify(vk, pred, one, proof_3)


@pytest.mark.pcd_toy
def test_toy_pcd_rejects_wrong_witness():
    """A prover violating the predicate cannot produce a proof."""
    from pcd_tpu.snark.api import SNARKError

    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = TestPredicate(F)
    rng = ChaChaRng(b"pcd neg test")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    one = F.from_int(1)
    with pytest.raises(SNARKError):
        # claims msg=5 from prior 0 with witness 1: predicate unsatisfied
        pcd.prove(pk, pred, F.from_int(5), one, [], [], rng)
