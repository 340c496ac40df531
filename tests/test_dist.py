"""Distributed prover data-plane on the virtual 8-device CPU mesh
(VERDICT round-2 item 5): the sharded h-poly pipeline and sharded MSM
must match the host oracles, and the full Groth16 prove must work with
the distributed context injected."""

import numpy as np
import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.poly.domain import EvaluationDomain


def _mesh(n=8):
    from pcd_tpu.parallel.mesh import make_mesh

    return make_mesh(n)


def test_dist_h_poly_matches_host():
    from pcd_tpu.parallel.dist import DistHPoly

    cfg = M.toy_mnt4()
    F = cfg.Fr
    p = F.MODULUS
    mesh = _mesh()
    dom = EvaluationDomain.new(F, 64)
    N = dom.n
    rng = np.random.default_rng(5)
    # a*b = c on the domain => h = (AB - C)/Z_H is a polynomial
    a_ev = [int(rng.integers(1, p)) for _ in range(N)]
    b_ev = [int(rng.integers(1, p)) for _ in range(N)]
    c_ev = [a * b % p for a, b in zip(a_ev, b_ev)]
    # perturb c off the product so h is nonzero but still polynomial?
    # (AB - C must be divisible by Z_H on H: it vanishes on H iff equal
    # on H; keep c_ev = a*b on H and the quotient is the coset part)
    d = DistHPoly(F, N, mesh)
    got = d.h_poly(a_ev, b_ev, c_ev)

    # host oracle (the single-chip path from groth16/native.py)
    a_cos = dom.coset_fft(dom.ifft(a_ev))
    b_cos = dom.coset_fft(dom.ifft(b_ev))
    c_cos = dom.coset_fft(dom.ifft(c_ev))
    zh_inv = pow(dom.vanishing_poly_at(dom.coset_shift), -1, p)
    h_cos = [(a_cos[i] * b_cos[i] - c_cos[i]) % p * zh_inv % p
             for i in range(N)]
    want = dom.coset_ifft(h_cos)
    assert got == want


def test_dist_msm_matches_host():
    import jax.numpy as jnp

    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx
    from pcd_tpu.parallel.dist import DistContext

    cfg = M.toy_mnt4()
    r = cfg.g1.order
    mesh = _mesh()
    dctx = DistContext(mesh)
    mctx = msm_ctx(cfg.g1, cfg.Fr.BITS)
    rng = np.random.default_rng(6)
    g = cfg.g1_gen
    n = 96
    pts = [g * int(rng.integers(1, r)) for _ in range(n)]
    scalars = [int(rng.integers(0, r)) for _ in range(n)]
    X, Y, Z = mctx.ec.encode_points(pts)
    digits = jnp.asarray(mctx.digits_from_ints(scalars))
    got = dctx.msm(mctx, (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)),
                   digits)
    assert got == host_msm(pts, scalars)


def test_dist_matvec_matches_host():
    """SP row sharding: Az/Bz/Cz from the row-sharded matvec must equal
    the host sparse evaluation (rows partitioned across all 8 devices,
    z replicated)."""
    import jax.numpy as jnp

    from pcd_tpu.ops.limbs import ctx_for
    from pcd_tpu.parallel.dist import DistContext

    cfg = M.toy_mnt4()
    F = cfg.Fr
    p = F.MODULUS
    rng = np.random.default_rng(7)
    n_rows, n_cols = 101, 37  # deliberately not multiples of 8
    rows = []
    for r in range(n_rows):
        def lc():
            return {int(c): int(rng.integers(1, p))
                    for c in rng.choice(n_cols, rng.integers(0, 6),
                                        replace=False)}
        rows.append((lc(), lc(), lc()))
    z = [int(rng.integers(0, p)) for _ in range(n_cols)]

    dctx = DistContext(_mesh())
    dmv = dctx.matvec(F, rows, n_rows, n_cols)
    fp = ctx_for(p)
    outs = dmv.apply_all(jnp.asarray(fp.encode(z)))

    for k in range(3):
        got = fp.decode(np.asarray(outs[k]))[:n_rows]
        want = [sum(co * z[c] for c, co in rows[r][k].items()) % p
                for r in range(n_rows)]
        assert got == want, f"matrix {k} mismatch"


@pytest.mark.heavy
def test_groth16_prove_with_dist_context():
    """Full Groth16 prove on the device path with the distributed context:
    sharded MSMs + distributed h-poly inside the real prover."""
    from pcd_tpu.gadgets.fp import fpvar_class
    from pcd_tpu.parallel.dist import DistContext
    from pcd_tpu.snark.groth16.native import Groth16
    from pcd_tpu.utils.rng import ChaChaRng

    class Circ:
        def generate_constraints(self, cs):
            V = fpvar_class(cs)
            x = V.new_instance(35)
            a = V.new_witness(5)
            b = V.new_witness(7)
            (a * b).enforce_equal(x)
            acc = a
            for _ in range(40):
                acc = acc * b
            acc.enforce_equal(V.new_witness(acc.val))

    cfg = M.toy_mnt4()
    snark = Groth16(cfg, backend="device")
    snark.dist = DistContext(_mesh())
    rng = ChaChaRng(b"dist prove")
    pk, vk = snark.circuit_specific_setup(Circ(), rng)
    proof = snark.prove(pk, Circ(), rng)
    assert snark.verify(vk, [cfg.Fr.from_int(35)], proof)
    assert not snark.verify(vk, [cfg.Fr.from_int(36)], proof)


def test_tp_window_sharded_msm_matches_host():
    """TP: the window/bucket axis sharded over the 8-device mesh (points
    replicated), Horner tail on host — must equal the host oracle."""
    import jax.numpy as jnp

    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx
    from pcd_tpu.parallel.mesh import sharded_msm_windows

    cfg = M.toy_mnt4()
    r = cfg.g1.order
    mesh = _mesh()
    mctx = msm_ctx(cfg.g1, cfg.Fr.BITS, signed=True)
    rng = np.random.default_rng(11)
    g = cfg.g1_gen
    n = 64
    pts = [g * int(rng.integers(1, r)) for _ in range(n)]
    scalars = [int(rng.integers(0, r)) for _ in range(n)]
    X, Y, Z = mctx.ec.encode_points(pts)
    digits = jnp.asarray(mctx.digits_from_ints(scalars))

    run = sharded_msm_windows(mctx, mesh)
    ws = run((jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)), digits)
    wsn = tuple(np.asarray(c) for c in ws)
    acc = cfg.g1.infinity()
    for w in reversed(range(mctx.nwin)):
        for _ in range(mctx.c):
            acc = acc.double()
        acc = acc + mctx.ec.decode_point(tuple(c[w] for c in wsn))
    assert acc == host_msm(pts, scalars)
