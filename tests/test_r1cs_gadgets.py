"""R1CS builder + core gadget tests."""

import random

from pcd_tpu.curves import models as M
from pcd_tpu.fields.tower import make_ext_field
from pcd_tpu.gadgets.fp import Boolean, UInt8, fpvar_class
from pcd_tpu.r1cs.system import ConstraintSystem

rng = random.Random(7)


def fresh(field=None):
    F = field or M.toy_mnt4().Fr
    cs = ConstraintSystem(F)
    return cs, fpvar_class(cs)


def test_fp_arith_and_satisfiability():
    cs, V = fresh()
    a = V.new_witness(17)
    b = V.new_witness(29)
    c = a * b
    c.enforce_equal(V.constant(17 * 29))
    (a + b).enforce_equal(V.constant(46))
    (a - b).enforce_equal(V.constant(17 - 29))
    d = a.inv()
    (d * a).enforce_equal(V.one())
    assert cs.is_satisfied()
    # tamper: break a witness value
    cs.witness[0] = 18
    assert not cs.is_satisfied()


def test_fp_constant_folding():
    cs, V = fresh()
    n0 = cs.num_constraints
    x = V.constant(5) * V.constant(6) + V.constant(7)
    assert x.is_constant and x.val == 37
    assert cs.num_constraints == n0  # no constraints for constant math


def test_boolean_ops():
    cs, V = fresh()
    for av in (False, True):
        for bv in (False, True):
            a = Boolean.new_witness(V, av)
            b = Boolean.new_witness(V, bv)
            assert (a & b).value == (av and bv)
            assert (a | b).value == (av or bv)
            assert (a ^ b).value == (av != bv)
            assert a.negate().value == (not av)
    assert cs.is_satisfied()


def test_boolean_select():
    cs, V = fresh()
    c = Boolean.new_witness(V, True)
    t, f = V.new_witness(11), V.new_witness(22)
    assert c.select(t, f).val == 11
    assert c.negate().select(t, f).val == 22
    assert cs.is_satisfied()


def test_bits_roundtrip_and_canonical():
    F = M.toy_mnt4().Fr
    cs, V = fresh(F)
    v = rng.randrange(F.MODULUS)
    x = V.new_witness(v)
    bits = x.to_bits_le()
    assert len(bits) == F.BITS
    got = 0
    for i, b in enumerate(bits):
        if b.value:
            got |= 1 << i
    assert got == v
    assert cs.is_satisfied()


def test_canonical_rejects_overflow():
    """Non-canonical bit assignment must violate constraints."""
    F = M.toy_mnt4().Fr
    cs, V = fresh(F)
    x = V.new_witness(1)
    bits = x.to_bits_le()
    # overwrite the bit witnesses to encode value  p + 1  (= x + p, same mod p)
    v = F.MODULUS + 1
    for i, b in enumerate(bits):
        var = next(iter(b.fp.lc))
        cs.witness[-var - 1] = (v >> i) & 1
    assert not cs.is_satisfied()


def test_to_bytes_matches_native():
    F = M.mnt4_298().Fr
    cs, V = fresh(F)
    e = F.rand(rng)
    x = V.new_witness(e)
    bts = x.to_bytes()
    assert bytes(b.value for b in bts) == e.to_bytes()
    assert len(bts) == F.BYTES
    assert cs.is_satisfied()


def test_uint8():
    cs, V = fresh()
    u = UInt8.new_witness(V, 0xA5)
    assert u.value == 0xA5
    assert [b.value for b in u.to_bits_le()] == [(0xA5 >> i) & 1 == 1 for i in range(8)]
    cv = UInt8.constant_vec(V, b"\x01\x02")
    assert [c.value for c in cv] == [1, 2]


def test_symbolic_tower_matches_host():
    """The generic tower over FpVars must agree with the host tower."""
    cfg = M.toy_mnt4()
    cs, V = fresh(cfg.Fq)
    E_host = cfg.Fq_k
    nr = cfg.Fq_half.NR.n
    E_sym = make_ext_field(V, 2, (nr,), "symFq2")
    # build host Fq2 with same NR for comparison
    E2_host = cfg.Fq_half
    a_h, b_h = E2_host.rand(rng), E2_host.rand(rng)
    def lift(e):
        return E_sym([V.new_witness(c) for c in e.c])
    a_s, b_s = lift(a_h), lift(b_h)
    for op in ("add", "mul", "inv"):
        if op == "add":
            h, s = a_h + b_h, a_s + b_s
        elif op == "mul":
            h, s = a_h * b_h, a_s * b_s
        else:
            h, s = a_h.inv(), a_s.inv()
        assert [c.n for c in h.c] == [c.val for c in s.c], op
    # frobenius
    fh = a_h.frobenius(1)
    fs = a_s.frobenius(1)
    assert [c.n for c in fh.c] == [c.val for c in fs.c]
    assert cs.is_satisfied()


def test_matrices_export():
    cs, V = fresh()
    x = V.new_instance(3)
    w = V.new_witness(4)
    (x * w).enforce_equal(V.constant(12))
    A, B, C = cs.matrices_coo()
    assert cs.num_instance == 2 and cs.num_witness >= 1
    z = cs.full_assignment()
    p = cs.p
    # check A z * B z == C z row-wise
    import collections
    for (rows, cols, vals), tag in ((A, "A"), (B, "B"), (C, "C")):
        pass
    def eval_rows(m):
        acc = collections.defaultdict(int)
        for r, c, v in zip(*m):
            acc[r] += v * z[c]
        return acc
    ea, eb, ec = eval_rows(A), eval_rows(B), eval_rows(C)
    for r in range(cs.num_constraints):
        assert (ea[r] * eb[r] - ec[r]) % p == 0
