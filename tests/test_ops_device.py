"""Device (JAX) limb arithmetic + EC tensor ops vs host oracles.

Runs on CPU with 8 virtual devices (conftest) — identical code path to TPU.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcd_tpu.curves import models as M
from pcd_tpu.ops.ec_tensor import ec_ctx
from pcd_tpu.ops.limbs import ctx_for

rng = random.Random(33)


@pytest.mark.parametrize("modulus_name", ["toy", "mnt4q", "mnt4r"])
def test_mont_mul_add_sub(modulus_name):
    p = {
        "toy": M.toy_mnt4().Fq.MODULUS,
        "mnt4q": M.mnt4_298().Fq.MODULUS,
        "mnt4r": M.mnt4_298().Fr.MODULUS,
    }[modulus_name]
    ctx = ctx_for(p)
    n = 64
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    # include edge values
    xs[0], ys[0] = 0, 0
    xs[1], ys[1] = p - 1, p - 1
    xs[2], ys[2] = 1, p - 1
    a = jnp.asarray(ctx.encode(xs))
    b = jnp.asarray(ctx.encode(ys))

    mul = jax.jit(ctx.mont_mul)(a, b)
    assert ctx.decode(mul) == [x * y % p for x, y in zip(xs, ys)]

    s = jax.jit(ctx.add)(a, b)
    assert ctx.decode(s) == [(x + y) % p for x, y in zip(xs, ys)]

    d = jax.jit(ctx.sub)(a, b)
    assert ctx.decode(d) == [(x - y) % p for x, y in zip(xs, ys)]

    ng = jax.jit(ctx.neg)(a)
    assert ctx.decode(ng) == [(-x) % p for x in xs]


def test_mont_roundtrip_and_inv():
    p = M.mnt4_298().Fr.MODULUS
    ctx = ctx_for(p)
    xs = [rng.randrange(1, p) for _ in range(8)]
    a = jnp.asarray(ctx.encode(xs))
    inv = jax.jit(ctx.inv_mont)(a)
    assert ctx.decode(inv) == [pow(x, -1, p) for x in xs]
    raw = jax.jit(ctx.from_mont)(a)
    back = jax.jit(ctx.to_mont)(raw)
    assert ctx.decode(back) == xs


@pytest.mark.parametrize("curve_name", ["toy4", "mnt4", "mnt6"])
def test_ec_add_matches_host(curve_name):
    cfg = {"toy4": M.toy_mnt4, "mnt4": M.mnt4_298, "mnt6": M.mnt6_298}[curve_name]()
    ec = ec_ctx(cfg.g1)
    g = cfg.g1_gen
    pts_a = [g * rng.randrange(1, 2**30) for _ in range(6)] + [cfg.g1.infinity(), g]
    pts_b = [g * rng.randrange(1, 2**30) for _ in range(6)] + [g, -g]
    A = tuple(jnp.asarray(c) for c in ec.encode_points(pts_a))
    B = tuple(jnp.asarray(c) for c in ec.encode_points(pts_b))
    S = jax.jit(ec.add)(A, B)
    for i in range(len(pts_a)):
        got = ec.decode_point((S[0][i], S[1][i], S[2][i]))
        assert got == pts_a[i] + pts_b[i], f"row {i}"
    # doubling through the same path
    D = jax.jit(ec.double)(A)
    for i in range(len(pts_a)):
        got = ec.decode_point((D[0][i], D[1][i], D[2][i]))
        assert got == pts_a[i].double(), f"dbl row {i}"


def test_ec_identity_handling():
    cfg = M.toy_mnt4()
    ec = ec_ctx(cfg.g1)
    I = ec.identity((4,))
    A = tuple(jnp.asarray(c) for c in ec.encode_points(
        [cfg.g1_gen * i for i in range(1, 5)]))
    S = jax.jit(ec.add)(I, A)
    for i in range(4):
        assert ec.decode_point((S[0][i], S[1][i], S[2][i])) == cfg.g1_gen * (i + 1)
    assert bool(jnp.all(ec.is_identity(I)))


@pytest.mark.parametrize("curve_name,n", [("toy4", 100)])
def test_msm_tensor_matches_host(curve_name, n):
    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx

    cfg = {"toy4": M.toy_mnt4, "mnt4": M.mnt4_298}[curve_name]()
    r = cfg.g1.order
    ctx = msm_ctx(cfg.g1, cfg.Fr.BITS)
    g = cfg.g1_gen
    pts = [g * rng.randrange(1, r) for _ in range(n)]
    scalars = [rng.randrange(r) for _ in range(n)]
    scalars[0] = 0          # zero scalar
    scalars[1] = r - 1      # max scalar
    pts[2] = cfg.g1.infinity()  # infinity point in the set
    want = host_msm(pts, scalars)
    got = ctx.msm(pts, scalars)
    assert got == want


@pytest.mark.heavy
def test_msm_tensor_c16_matches_host():
    """c=16 windows (the large-n default per msm_ctx_for) on a small set."""
    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx

    cfg = M.toy_mnt4()
    r = cfg.g1.order
    ctx = msm_ctx(cfg.g1, cfg.Fr.BITS, c=16)
    g = cfg.g1_gen
    pts = [g * rng.randrange(1, r) for _ in range(60)]
    scalars = [rng.randrange(r) for _ in range(60)]
    scalars[0] = 0
    scalars[1] = r - 1
    pts[2] = cfg.g1.infinity()
    assert ctx.msm(pts, scalars) == host_msm(pts, scalars)


def test_msm_tensor_all_equal_digits():
    from pcd_tpu.ops.msm_tensor import msm_ctx
    from pcd_tpu.msm.host import msm as host_msm

    cfg = M.toy_mnt4()
    ctx = msm_ctx(cfg.g1, cfg.Fr.BITS)
    g = cfg.g1_gen
    pts = [g * (i + 1) for i in range(16)]
    scalars = [5] * 16  # all in one bucket
    assert ctx.msm(pts, scalars) == host_msm(pts, scalars)


@pytest.mark.parametrize("field_name,size_hint", [("toy_r", 24), ("mnt4_r", 32), ("mnt6_r", 70)])
def test_fft_tensor_matches_host(field_name, size_hint):
    from pcd_tpu.ops.fft_tensor import fft_ctx
    from pcd_tpu.poly.domain import EvaluationDomain

    F = {"toy_r": M.toy_mnt4().Fr, "mnt4_r": M.mnt4_298().Fr,
         "mnt6_r": M.mnt6_298().Fr}[field_name]
    dom = EvaluationDomain.new(F, size_hint)
    ctx = fft_ctx(F, dom.n)
    coeffs = [rng.randrange(F.MODULUS) for _ in range(dom.n)]
    a = jnp.asarray(ctx.encode(coeffs))[None]  # batch of 1

    got = ctx.decode(jax.jit(ctx.fft)(a))
    want = dom.fft(coeffs)
    assert got == want

    back = ctx.decode(jax.jit(ctx.ifft)(jax.jit(ctx.fft)(a)))
    assert back == coeffs

    cgot = ctx.decode(jax.jit(ctx.coset_fft)(a))
    cwant = dom.coset_fft(coeffs)
    assert cgot == cwant
    cback = ctx.decode(jax.jit(ctx.coset_ifft)(jax.jit(ctx.coset_fft)(a)))
    assert cback == coeffs


@pytest.mark.parametrize("curve_name", ["toy4_g2"])
@pytest.mark.heavy
def test_msm_tensor_g2(curve_name):
    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx

    cfg = {"toy4_g2": M.toy_mnt4, "mnt4_g2": M.mnt4_298,
           "mnt6_g2": M.mnt6_298}[curve_name]()
    r = cfg.g2.order
    n = 12
    ctx = msm_ctx(cfg.g2, cfg.Fr.BITS)
    g = cfg.g2_gen
    pts = [g * rng.randrange(1, r) for _ in range(n)]
    scalars = [rng.randrange(r) for _ in range(n)]
    scalars[0] = 0
    want = host_msm(pts, scalars)
    got = ctx.msm(pts, scalars)
    assert got == want


@pytest.mark.slow
@pytest.mark.parametrize("curve_name", ["mnt4_g1", "mnt4_g2", "mnt6_g2"])
def test_msm_tensor_real_curves(curve_name):
    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx

    cfg = M.mnt4_298() if curve_name.startswith("mnt4") else M.mnt6_298()
    g2 = curve_name.endswith("g2")
    curve = cfg.g2 if g2 else cfg.g1
    gen = cfg.g2_gen if g2 else cfg.g1_gen
    n = 12
    ctx = msm_ctx(curve, cfg.Fr.BITS)
    pts = [gen * rng.randrange(1, curve.order) for _ in range(n)]
    scalars = [rng.randrange(curve.order) for _ in range(n)]
    assert ctx.msm(pts, scalars) == host_msm(pts, scalars)


def test_sharded_msm_virtual_mesh():
    """Multi-chip MSM on the 8-device virtual CPU mesh (same code path as a
    pod slice): points sharded, partials combined via all_gather + tree add."""
    import jax
    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx
    from pcd_tpu.parallel.mesh import make_mesh, sharded_msm, shard_batch

    cfg = M.toy_mnt4()
    ctx = msm_ctx(cfg.g1, cfg.Fr.BITS)
    mesh = make_mesh(8)
    n = 64  # 8 per device
    g = cfg.g1_gen
    pts = [g * rng.randrange(1, cfg.g1.order) for _ in range(n)]
    scalars = [rng.randrange(cfg.g1.order) for _ in range(n)]
    X, Y, Z = ctx.ec.encode_points(pts)
    digits = ctx.digits_from_ints(scalars)
    run = sharded_msm(ctx, mesh)
    Xs = shard_batch(jnp.asarray(X), mesh, "shard", 0)
    Ys = shard_batch(jnp.asarray(Y), mesh, "shard", 0)
    Zs = shard_batch(jnp.asarray(Z), mesh, "shard", 0)
    ds = shard_batch(jnp.asarray(digits), mesh, "shard", 1)
    out = run((Xs, Ys, Zs), ds)
    assert ctx.ec.decode_point(out) == host_msm(pts, scalars)


def test_sparse_matvec_matches_host():
    from pcd_tpu.ops.matvec_tensor import eval_rows_device, matrices_to_device

    F = M.toy_mnt4().Fr
    p = F.MODULUS
    n_rows, n_cols = 37, 23
    rows = []
    for r in range(n_rows):
        def mk():
            return {rng.randrange(n_cols): rng.randrange(p)
                    for _ in range(rng.randrange(4))}
        rows.append((mk(), mk(), mk()))
    z = [rng.randrange(p) for _ in range(n_cols)]
    mats = matrices_to_device(F, rows, n_rows, n_cols)
    got = eval_rows_device(mats, z, F)
    for k in range(3):
        want = [sum(co * z[c] for c, co in rows[j][k].items()) % p
                for j in range(n_rows)]
        assert got[k] == want, f"matrix {k}"


def test_distributed_fft_all_to_all():
    """4-step FFT across the virtual 8-device mesh vs the host oracle."""
    from pcd_tpu.parallel.fft import DistributedFFT
    from pcd_tpu.parallel.mesh import make_mesh
    from pcd_tpu.poly.domain import EvaluationDomain

    F = M.toy_mnt4().Fr
    mesh = make_mesh(8)
    n1, n2 = 16, 32
    dfft = DistributedFFT(F, n1, n2, mesh)
    coeffs = [rng.randrange(F.MODULUS) for _ in range(n1 * n2)]
    got = dfft.fft(coeffs)
    dom = EvaluationDomain(F, n1 * n2)
    want = dom.fft(coeffs)
    assert got == want


@pytest.mark.parametrize("c", [4, 8])
def test_msm_tensor_signed_digits_match_host(c):
    """Signed-digit windows (|d| <= 2^(c-1), sign bit 31, carry-out
    window): must equal the host oracle including zero / max scalars,
    infinity points, and scalars that exercise long carry chains."""
    from pcd_tpu.msm.host import msm as host_msm
    from pcd_tpu.ops.msm_tensor import msm_ctx

    cfg = M.toy_mnt4()
    r = cfg.g1.order
    ctx = msm_ctx(cfg.g1, cfg.Fr.BITS, c=c, signed=True)
    assert ctx.signed and ctx.nwin == (cfg.Fr.BITS + c - 1) // c + 1
    g = cfg.g1_gen
    n = 50
    pts = [g * rng.randrange(1, r) for _ in range(n)]
    scalars = [rng.randrange(r) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = r - 1
    # all-ones bit patterns: every window recodes with a carry
    scalars[2] = (1 << (cfg.Fr.BITS - 1)) - 1
    scalars[3] = (1 << (c - 1))           # exactly half: kept positive
    scalars[4] = (1 << c) - 1             # -1 + carry into next window
    pts[5] = cfg.g1.infinity()
    assert ctx.msm(pts, scalars) == host_msm(pts, scalars)


def test_msm_signed_digit_recoding_values():
    """digits_from_ints (signed): sum of d_w * 2^(c*w) reconstructs the
    scalar exactly."""
    from pcd_tpu.ops.msm_tensor import msm_ctx

    cfg = M.toy_mnt4()
    ctx = msm_ctx(cfg.g1, cfg.Fr.BITS, c=8, signed=True)
    scalars = [0, 1, 255, 256, (1 << cfg.Fr.BITS) - 1,
               rng.randrange(cfg.g1.order)]
    D = ctx.digits_from_ints(scalars)
    half = 1 << (ctx.c - 1)
    for j, s in enumerate(scalars):
        total = 0
        for w in range(ctx.nwin):
            v = int(D[w, j])
            mag = v & 0x7FFFFFFF
            assert mag <= half
            total += (-mag if v >> 31 else mag) << (ctx.c * w)
        assert total == s, (j, s, total)
