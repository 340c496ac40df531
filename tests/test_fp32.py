"""f32/8-bit-limb field + EC path (ops/fp32.py, ops/ec32.py) vs exact
host-int oracles.  Runs the plain-XLA composition on CPU; the fused
Pallas kernel shares the identical math functions on TPU."""

import numpy as np
import pytest

from pcd_tpu.fields.constants import MNT4_Q, MNT6_Q
from pcd_tpu.ops.fp32 import fp32_ctx


@pytest.mark.parametrize("p", [MNT4_Q, MNT6_Q])
def test_fp32_mul_matches_host(p):
    import jax.numpy as jnp

    fp = fp32_ctx(p)
    rng = np.random.default_rng(7)
    n = 64
    xs = [int.from_bytes(rng.bytes(37), "little") % p for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(37), "little") % p for _ in range(n)]
    A = jnp.asarray(fp.encode(xs))
    B = jnp.asarray(fp.encode(ys))
    out = fp.decode(np.asarray(fp.mul(A, B)))
    assert out == [x * y % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("p", [MNT4_Q])
def test_fp32_add_sub_chains(p):
    """Chained lazy adds/subs then a mul: values stay in class, decode
    exact."""
    import jax.numpy as jnp

    fp = fp32_ctx(p)
    rng = np.random.default_rng(8)
    n = 32
    xs = [int.from_bytes(rng.bytes(37), "little") % p for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(37), "little") % p for _ in range(n)]
    zs = [int.from_bytes(rng.bytes(37), "little") % p for _ in range(n)]
    A, B, C = (jnp.asarray(fp.encode(v)) for v in (xs, ys, zs))
    # e = (a + b - c + a) * (b - a)
    e = fp.mul(fp.add(fp.sub(fp.add(A, B), C), A), fp.sub(B, A))
    out = fp.decode(np.asarray(e))
    expect = [((x + y - z + x) * (y - x)) % p
              for x, y, z in zip(xs, ys, zs)]
    assert out == expect


def test_fp32_deep_mul_chain():
    """100 dependent Montgomery muls (the MSM scan depth pattern)."""
    import jax
    import jax.numpy as jnp

    p = MNT4_Q
    fp = fp32_ctx(p)
    rng = np.random.default_rng(9)
    n = 16
    xs = [int.from_bytes(rng.bytes(37), "little") % p for _ in range(n)]
    A = jnp.asarray(fp.encode(xs))

    def body(i, y):
        return fp.mul(y, A)

    y = jax.lax.fori_loop(0, 100, body, A)
    out = fp.decode(np.asarray(y))
    expect = [pow(x, 101, p) for x in xs]
    assert out == expect


def test_ec32_add_matches_host():
    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.ops.ec32 import ec32_ctx

    cyc = mnt_cycle()
    curve = cyc.main.g1
    ec = ec32_ctx(curve)
    g = cyc.main.g1_gen
    pts_a = [g * (i + 1) for i in range(16)]
    pts_b = [g * (7 * i + 3) for i in range(16)]
    # include identity and doubling cases (complete formulas)
    pts_a[3] = curve.infinity()
    pts_b[5] = pts_a[5]
    import jax.numpy as jnp

    P = tuple(jnp.asarray(c) for c in ec.encode_points(pts_a))
    Q = tuple(jnp.asarray(c) for c in ec.encode_points(pts_b))
    R = ec.add(P, Q)
    Rn = tuple(np.asarray(c) for c in R)
    for i in range(16):
        got = ec.decode_point(tuple(c[i] for c in Rn))
        assert got == pts_a[i] + pts_b[i], f"row {i}"


def test_ec32_scan_chain():
    """Associative-scan-shaped repeated additions stay exact."""
    import jax
    import jax.numpy as jnp

    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.ops.ec32 import ec32_ctx

    cyc = mnt_cycle()
    ec = ec32_ctx(cyc.main.g1)
    g = cyc.main.g1_gen
    pts = [g * (i + 1) for i in range(8)]
    P = tuple(jnp.asarray(c) for c in ec.encode_points(pts))

    def body(i, acc):
        return ec.add(acc, P)

    acc = jax.lax.fori_loop(0, 50, body, ec.identity((8,)))
    accn = tuple(np.asarray(c) for c in acc)
    for i in range(8):
        got = ec.decode_point(tuple(c[i] for c in accn))
        assert got == pts[i] * 50, f"row {i}"


def test_ec32_ext_add_matches_host():
    """G2 (Fp2 coords) on the f32 path vs host arithmetic."""
    import jax.numpy as jnp

    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.ops.ec32 import ec32_ctx

    cyc = mnt_cycle()
    curve = cyc.main.g2
    ec = ec32_ctx(curve)
    g = cyc.main.g2_gen
    pts_a = [g * (i + 1) for i in range(8)]
    pts_b = [g * (5 * i + 2) for i in range(8)]
    pts_a[2] = curve.infinity()
    pts_b[4] = pts_a[4]  # doubling case
    P = tuple(jnp.asarray(c) for c in ec.encode_points(pts_a))
    Q = tuple(jnp.asarray(c) for c in ec.encode_points(pts_b))
    R = ec.add(P, Q)
    Rn = tuple(np.asarray(c) for c in R)
    for i in range(8):
        got = ec.decode_point(tuple(c[i] for c in Rn))
        assert got == pts_a[i] + pts_b[i], f"row {i}"


def test_ec32_ext_fp3_add_matches_host():
    """MNT6 G2 (Fp3 coords) on the f32 path vs host arithmetic."""
    import jax.numpy as jnp

    from pcd_tpu.curves.models import mnt_cycle
    from pcd_tpu.ops.ec32 import ec32_ctx

    cyc = mnt_cycle()
    curve = cyc.help.g2
    ec = ec32_ctx(curve)
    g = cyc.help.g2_gen
    pts_a = [g * (i + 1) for i in range(4)]
    pts_b = [g * (3 * i + 2) for i in range(4)]
    P = tuple(jnp.asarray(c) for c in ec.encode_points(pts_a))
    Q = tuple(jnp.asarray(c) for c in ec.encode_points(pts_b))
    R = ec.add(P, Q)
    Rn = tuple(np.asarray(c) for c in R)
    for i in range(4):
        got = ec.decode_point(tuple(c[i] for c in Rn))
        assert got == pts_a[i] + pts_b[i], f"row {i}"
