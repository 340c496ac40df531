"""Serialization round-trips for proofs/vks and PCD checkpoint/resume
(SURVEY.md D15 / §5 checkpoint-resume: any (msg, proof) pair is resumable
state)."""

import pytest

from pcd_tpu import configs
from pcd_tpu.curves import models as M
from pcd_tpu.gadgets.fp import fpvar_class
from pcd_tpu.pcd.api import FpPredicate
from pcd_tpu.snark.gm17.native import GM17
from pcd_tpu.snark.groth16.native import Groth16
from pcd_tpu.snark.marlin.native import MarlinSNARK
from pcd_tpu.utils import serialize as S
from pcd_tpu.utils.rng import ChaChaRng


class MulCircuit:
    def generate_constraints(self, cs):
        V = fpvar_class(cs)
        x = V.new_instance(24)
        (V.new_witness(4) * V.new_witness(6)).enforce_equal(x)


def test_groth16_roundtrip_bytes():
    cfg = M.toy_mnt4()
    g = Groth16(cfg)
    rng = ChaChaRng(b"ser g16")
    pk, vk = g.circuit_specific_setup(MulCircuit(), rng)
    proof = g.prove(pk, MulCircuit(), rng)
    x = cfg.Fr.from_int(24)

    p2 = S.groth16_proof_from_bytes(cfg, S.groth16_proof_to_bytes(proof))
    vk2 = S.groth16_vk_from_bytes(cfg, S.groth16_vk_to_bytes(vk))
    assert g.verify(vk2, [x], p2)
    assert S.groth16_proof_to_bytes(p2) == S.groth16_proof_to_bytes(proof)


def test_gm17_roundtrip_bytes():
    cfg = M.toy_mnt6()
    g = GM17(cfg)
    rng = ChaChaRng(b"ser gm17")
    pk, vk = g.circuit_specific_setup(MulCircuit(), rng)
    proof = g.prove(pk, MulCircuit(), rng)
    x = cfg.Fr.from_int(24)
    p2 = S.gm17_proof_from_bytes(cfg, S.gm17_proof_to_bytes(proof))
    vk2 = S.gm17_vk_from_bytes(cfg, S.gm17_vk_to_bytes(vk))
    assert g.verify(vk2, [x], p2)


def test_marlin_proof_roundtrip_bytes():
    cfg = M.toy_mnt4()
    m = MarlinSNARK(cfg)
    rng = ChaChaRng(b"ser marlin")
    pk, vk = m.circuit_specific_setup(MulCircuit(), rng)
    proof = m.prove(pk, MulCircuit(), rng)
    x = cfg.Fr.from_int(24)
    p2 = S.marlin_proof_from_bytes(cfg, S.marlin_proof_to_bytes(proof, cfg.Fr))
    assert m.verify(vk, [x], p2)
    assert S.marlin_proof_to_bytes(p2, cfg.Fr) == \
        S.marlin_proof_to_bytes(proof, cfg.Fr)


class Counter(FpPredicate):
    PRIOR_MSG_LEN = 1

    def generate_constraints(self, cs, msg, wit, priors, base):
        (priors[0] + wit).enforce_equal(msg)


@pytest.mark.pcd_toy
def test_pcd_checkpoint_resume():
    """Serialize a PCD proof, reload it in place of the live object, and
    continue the IVC chain — the checkpoint/resume flow."""
    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = Counter(F)
    rng = ChaChaRng(b"ckpt")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    one = F.from_int(1)
    p1 = pcd.prove(pk, pred, one, one, [], [], rng)
    blob = S.pcd_proof_to_bytes(pcd, p1)
    p1_restored = S.pcd_proof_from_bytes(pcd, blob)
    assert pcd.verify(vk, pred, one, p1_restored)
    # resume the chain from the restored checkpoint
    two = F.from_int(2)
    p2 = pcd.prove(pk, pred, two, one, [one], [p1_restored], rng)
    assert pcd.verify(vk, pred, two, p2)


def test_pcd_pk_checkpoint_roundtrip():
    """Proving-key checkpoint: serialize pk, reload, prove with the loaded
    pk and verify — the warm-restart path of a long-running deployment."""
    from pcd_tpu.utils.serialize import pcd_pk_from_bytes, pcd_pk_to_bytes
    from tests.test_pcd import TestPredicate

    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = TestPredicate(F)
    rng = ChaChaRng(b"pk checkpoint")
    pk, vk = pcd.circuit_specific_setup(pred, rng)
    blob = pcd_pk_to_bytes(pcd, pk)
    pk2 = pcd_pk_from_bytes(pcd, blob)

    one = F.from_int(1)
    p1 = pcd.prove(pk2, pred, one, one, [], [], rng)
    assert pcd.verify(vk, pred, one, p1)
    v2 = F.from_int(2)
    p2 = pcd.prove(pk2, pred, v2, one, [one], [p1], rng)
    assert pcd.verify(vk, pred, v2, p2)


def test_ark_compat_point_roundtrip():
    """ark-serialize-layout SW points (compressed + uncompressed) round-trip
    for G1 (prime base field) and G2 (extension base field), including
    infinity and both y signs (VERDICT r2 item 9; layout pinned from the
    ark-serialize Cargo.toml:16 dependency — flags in the top two bits of
    the final coefficient byte)."""
    for cfg in (M.toy_mnt4(), M.toy_mnt6()):
        for curve, gen in ((cfg.g1, cfg.g1_gen), (cfg.g2, cfg.g2_gen)):
            pts = [gen, gen * 2, gen * 3, -gen, -(gen * 5), curve.infinity()]
            for pt in pts:
                for compressed in (True, False):
                    b = S.ark_point_to_bytes(pt, compressed)
                    assert len(b) == S.ark_point_size(curve, compressed)
                    got, off = S.ark_point_from_bytes(curve, b, compressed)
                    assert off == len(b)
                    assert got == pt, (curve.name, compressed)


def test_ark_compat_sign_flag_selects_root():
    """The compressed encodings of P and -P differ only in the sign flag
    and decode to distinct points."""
    cfg = M.toy_mnt4()
    g = cfg.g1_gen * 7
    b_pos = S.ark_point_to_bytes(g, True)
    b_neg = S.ark_point_to_bytes(-g, True)
    assert b_pos[:-1] == b_neg[:-1]
    assert b_pos[-1] != b_neg[-1]
    p1, _ = S.ark_point_from_bytes(cfg.g1, b_pos, True)
    p2, _ = S.ark_point_from_bytes(cfg.g1, b_neg, True)
    assert p1 == g and p2 == -g


def test_ark_compat_rejects_bad_bytes():
    cfg = M.toy_mnt4()
    size = S.ark_point_size(cfg.g1, True)
    # coefficient >= modulus must be rejected
    bad = bytes([0xFF] * (size - 1)) + bytes([0x3F])
    with pytest.raises(ValueError):
        S.ark_point_from_bytes(cfg.g1, bad, True)
