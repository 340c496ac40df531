"""CRH tests: native-vs-gadget equivalence over small TE curves — the exact
test strategy of the reference (pedersen/constraints.rs:86-153,
bowe_hopwood/constraints.rs:123-185: random input bytes, compare gadget
output to native output, assert the CS is satisfied)."""

import random

import pytest

from pcd_tpu.crh.bowe_hopwood import BoweHopwoodCRH
from pcd_tpu.crh.pedersen import PedersenCRH, PedersenCRHCompressor
from pcd_tpu.curves import models as M
from pcd_tpu.gadgets.fp import UInt8, fpvar_class
from pcd_tpu.r1cs.system import ConstraintSystem
from pcd_tpu.utils.rng import ChaChaRng, test_rng as _test_rng

rng = random.Random(2718)


def _curve(name):
    return {"toy": M.toy_te, "jubjub": M.jubjub}[name]()


@pytest.mark.parametrize("curve_name", ["toy", "jubjub"])
def test_bowe_hopwood_native_vs_gadget(curve_name):
    curve = _curve(curve_name)
    crh = BoweHopwoodCRH(curve)
    pp = crh.setup(_test_rng())
    data = bytes(rng.randrange(256) for _ in range(189))  # same len as reference test
    native = crh.evaluate(pp, data)

    cs = ConstraintSystem(curve.F)
    V = fpvar_class(cs)
    input_bytes = UInt8.new_witness_vec(V, data)
    out = crh.check_evaluation_gadget(V, pp, input_bytes)
    assert out.val == native.n
    assert cs.is_satisfied()


@pytest.mark.parametrize("curve_name", ["toy", "jubjub"])
def test_pedersen_native_vs_gadget(curve_name):
    curve = _curve(curve_name)
    crh = PedersenCRH(curve)
    pp = crh.setup(_test_rng())
    data = bytes(rng.randrange(256) for _ in range(128))  # reference length
    native = crh.evaluate(pp, data)

    cs = ConstraintSystem(curve.F)
    V = fpvar_class(cs)
    input_bytes = UInt8.new_witness_vec(V, data)
    out = crh.check_evaluation_gadget(V, pp, input_bytes)
    assert out.x.val == native.x.n and out.y.val == native.y.n
    assert cs.is_satisfied()


def test_pedersen_compressor():
    curve = _curve("toy")
    crh = PedersenCRHCompressor(curve)
    pp = crh.setup(_test_rng())
    data = b"hello pcd"
    native = crh.evaluate(pp, data)
    full = PedersenCRH(curve).evaluate(pp, data)
    assert native == full.x

    cs = ConstraintSystem(curve.F)
    V = fpvar_class(cs)
    out = crh.check_evaluation_gadget(V, pp, UInt8.new_witness_vec(V, data))
    assert out.val == native.n
    assert cs.is_satisfied()


def test_crh_determinism_and_sensitivity():
    curve = _curve("toy")
    crh = BoweHopwoodCRH(curve)
    pp = crh.setup(_test_rng())
    a = crh.evaluate(pp, b"abc")
    assert a == crh.evaluate(pp, b"abc")
    assert a != crh.evaluate(pp, b"abd")
    # different seed -> different hash
    pp2 = crh.setup(ChaChaRng(b"another seed"))
    assert a != crh.evaluate(pp2, b"abc")


def test_variable_length():
    curve = _curve("toy")
    crh = BoweHopwoodCRH(curve)
    pp = crh.setup(_test_rng())
    for n in (0, 1, 2, 3, 24, 63, 64, 65, 200):
        crh.evaluate(pp, bytes(n))  # must not raise


def test_chacha_known_vector():
    """RFC 7539 block test vector (verifies the keystream core)."""
    from pcd_tpu.utils.rng import chacha20_block

    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    block = chacha20_block(key, 1, nonce)
    assert block[:16].hex() == "10f1e7e4d13b5915500fdd1fa32071c4"


def test_chacha_bulk_matches_scalar():
    """chacha20_blocks_np / fill_bytes bulk path / randrange_many must be
    byte-identical to the scalar RFC-7539 path (generators and zk masks
    are derived from this stream — any drift changes every hash)."""
    from pcd_tpu.utils.rng import (ChaChaRng, chacha20_block,
                                   chacha20_blocks_np)

    key = bytes(range(32))
    want = b"".join(chacha20_block(key, 5 + i, b"\x00" * 12)
                    for i in range(9))
    assert chacha20_blocks_np(key, 5, 9) == want
    a, b = ChaChaRng(b"bulk"), ChaChaRng(b"bulk")
    assert (a.fill_bytes(50) + a.fill_bytes(700)
            == b"".join(b.fill_bytes(1) for _ in range(750)))
    p = (1 << 255) - 19
    a, b = ChaChaRng(b"mask"), ChaChaRng(b"mask")
    assert a.randrange_many(p, 100) == [b.randrange(p) for _ in range(100)]
    assert a.randrange(p) == b.randrange(p)   # identical post-state
