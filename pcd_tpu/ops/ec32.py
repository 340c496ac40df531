"""Batched EC arithmetic on the f32/8-bit-limb field path (ops/fp32.py),
with the complete RCB addition fused into ONE Pallas kernel per call:
all 12 field products and every intermediate live in VMEM, so HBM sees
only the 6 input and 3 output coordinate arrays.  This is the MSM
speed-of-light path (VERDICT round-2 item 2); the u32 path
(ops/ec_tensor.py) remains as oracle and CPU fallback.

Kernel strategy: the field helpers in Fp32Ctx are plain jnp on (B, KP)
f32 arrays, so the SAME RCB code runs (a) inside a pallas_call on VMEM
blocks on TPU, (b) as straight XLA ops on CPU (tests).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .fp32 import Fp32Ctx, fp32_ctx, ints_to_f32_limbs_np


def _rcb_add(fp: Fp32Ctx, consts, fld, P, Q):
    """Complete projective addition (RCB15 alg 1, arbitrary a) over
    quasi-settled f32 limb coords.  consts = (a, b3, a2) encoded;
    fld = (N0, P0, off4p) from Fp32Ctx.consts() (explicit because Pallas
    forbids captured array constants)."""
    a_c, b3_c, a2_c = consts
    N0, P0, off = fld
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q

    def mul(a, b):
        return fp.mul(a, b, N0, P0)

    def sub(a, b):
        return fp.sub(a, b, off)

    add = fp.add

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = sub(sub(mul(add(X1, Z1), add(X2, Z2)), t0), t2)
    t5 = sub(sub(mul(add(Y1, Z1), add(Y2, Z2)), t1), t2)
    Zp = add(mul(a_c, t4), mul(b3_c, t2))
    X3 = sub(t1, Zp)
    Z3 = add(t1, Zp)
    Y3 = mul(X3, Z3)
    t1n = add(add(add(t0, t0), t0), mul(a_c, t2))
    t2n = sub(mul(a_c, t0), mul(a2_c, t2))   # = a*(t0 - a*t2)
    t4n = add(mul(b3_c, t4), t2n)
    Y3 = add(Y3, mul(t1n, t4n))
    X3o = sub(mul(t3, X3), mul(t5, t4n))
    Z3o = add(mul(t5, Z3), mul(t3, t1n))
    return X3o, Y3, Z3o


def _rcb_addT(fp: Fp32Ctx, consts, fld, P, Q):
    """Transposed-layout RCB add: coords (K, B), limbs on sublanes."""
    a_c, b3_c, a2_c = consts
    N0T, P0T, off = fld
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q

    def mul(a, b):
        return fp.mulT(a, b, N0T, P0T)

    def sub(a, b):
        return fp.subT(a, b, off)

    add = fp.addT

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = sub(sub(mul(add(X1, Z1), add(X2, Z2)), t0), t2)
    t5 = sub(sub(mul(add(Y1, Z1), add(Y2, Z2)), t1), t2)
    Zp = add(mul(a_c, t4), mul(b3_c, t2))
    X3 = sub(t1, Zp)
    Z3 = add(t1, Zp)
    Y3 = mul(X3, Z3)
    t1n = add(add(add(t0, t0), t0), mul(a_c, t2))
    t2n = sub(mul(a_c, t0), mul(a2_c, t2))
    t4n = add(mul(b3_c, t4), t2n)
    Y3 = add(Y3, mul(t1n, t4n))
    X3o = sub(mul(t3, X3), mul(t5, t4n))
    Z3o = add(mul(t5, Z3), mul(t3, t1n))
    return X3o, Y3, Z3o


class EC32Ctx:
    """Curve context on the f32 path (prime-field coordinates only: G1)."""

    BLOCK = 128   # VMEM stack: the fused RCB kernel's live set at B=256
                  # exceeded the 16MB scoped limit; 128 fits comfortably

    def __init__(self, curve):
        self.curve = curve
        F = curve.F
        assert F.extension_degree_over_prime() == 1, \
            "EC32Ctx is G1-only (prime coordinates)"
        self.fp = fp32_ctx(F.MODULUS)
        fp = self.fp

        def enc_const(e):
            arr = np.zeros(fp.kp, dtype=np.float32)
            arr[: fp.k] = ints_to_f32_limbs_np(
                [e.n * fp.R % fp.p], fp.k)[0]
            return arr

        self.a_enc = enc_const(curve.a)
        b3 = curve.b + curve.b + curve.b
        self.b3_enc = enc_const(b3)
        a2 = curve.a * curve.a
        self.a2_enc = enc_const(a2)

    # -- conversions ------------------------------------------------------
    def encode_points(self, pts):
        fp = self.fp
        n = len(pts)
        X = np.zeros((n, fp.kp), dtype=np.float32)
        Y = np.zeros((n, fp.kp), dtype=np.float32)
        Z = np.zeros((n, fp.kp), dtype=np.float32)
        one = np.zeros(fp.kp, dtype=np.float32)
        one[: fp.k] = fp.one_mont
        for i, pt in enumerate(pts):
            if pt.is_infinity():
                Y[i] = one
            else:
                X[i, : fp.k] = ints_to_f32_limbs_np(
                    [pt.x.n * fp.R % fp.p], fp.k)[0]
                Y[i, : fp.k] = ints_to_f32_limbs_np(
                    [pt.y.n * fp.R % fp.p], fp.k)[0]
                Z[i] = one
        return X, Y, Z

    def decode_point(self, P):
        fp = self.fp
        X, Y, Z = (np.asarray(c).reshape(1, -1) for c in P)
        F = self.curve.F
        x, y, z = (F(v) for v in
                   (fp.decode(X)[0], fp.decode(Y)[0], fp.decode(Z)[0]))
        if z.is_zero():
            return self.curve.infinity()
        zi = z.inv()
        return self.curve.point(x * zi, y * zi)

    def identity(self, shape=()):
        fp = self.fp
        return (fp.zeros(shape), fp.one(shape), fp.zeros(shape))

    def _consts(self, shape):
        return tuple(
            jnp.broadcast_to(jnp.asarray(c), shape)
            for c in (self.a_enc, self.b3_enc, self.a2_enc))

    # -- addition ---------------------------------------------------------
    def add(self, P, Q):
        """Complete add; fused Pallas kernel on TPU (rows padded to the
        block size), plain XLA elsewhere."""
        shape = P[0].shape
        if jax.default_backend() == "tpu" and len(shape) == 2:
            n = shape[0]
            B = self.BLOCK
            m = -(-n // B) * B
            if m != n:
                P = tuple(jnp.pad(c, [(0, m - n), (0, 0)]) for c in P)
                Q = tuple(jnp.pad(c, [(0, m - n), (0, 0)]) for c in Q)
            out = self._add_pallas_T(P, Q)
            if m != n:
                out = tuple(c[:n] for c in out)
            return out
        consts = self._consts(shape)
        return _rcb_add(self.fp, consts, self.fp.consts(), P, Q)

    def _add_pallas_T(self, P, Q):
        """Fused RCB kernel in the transposed (limbs-on-sublanes) layout:
        blocks are transposed on load/store; all math runs on dense
        (K, B) vregs."""
        from jax.experimental import pallas as pl

        fp = self.fp
        n, kp = P[0].shape
        B = self.BLOCK
        N0T = jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16)
        P0T = jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16)

        # pre-broadcast row constants to full block width (numpy: this
        # runs under an outer jit trace; Mosaic also cannot broadcast in
        # sublanes and lanes at once)
        def full(v):
            return jnp.asarray(
                np.broadcast_to(np.asarray(v, dtype=np.float32
                                           ).reshape(-1, 1), (kp, B)).copy())

        off = full(fp.off4p())
        ac = full(self.a_enc)
        b3c = full(self.b3_enc)
        a2c = full(self.a2_enc)

        def kernel(x1, y1, z1, x2, y2, z2, n0, p0, offr, a_r, b3_r, a2_r,
                   ox, oy, oz):
            fld = (n0[:], p0[:], offr[:])
            consts = (a_r[:], b3_r[:], a2_r[:])
            Pt = tuple(v[:].T for v in (x1, y1, z1))
            Qt = tuple(v[:].T for v in (x2, y2, z2))
            R = _rcb_addT(fp, consts, fld, Pt, Qt)
            ox[:], oy[:], oz[:] = (r.T for r in R)

        spec = pl.BlockSpec((B, kp), lambda i: (i, 0))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((n, kp), jnp.float32)] * 3
        fn = pl.pallas_call(
            kernel,
            grid=(n // B,),
            in_specs=[spec] * 6 + [whole(N0T), whole(P0T), whole(off),
                                   whole(ac), whole(b3c), whole(a2c)],
            out_specs=[spec] * 3,
            out_shape=out_shape,
        )
        return tuple(fn(*P, *Q, N0T, P0T, off, ac, b3c, a2c))

    def _add_pallas(self, P, Q):
        from jax.experimental import pallas as pl

        fp = self.fp
        n, kp = P[0].shape
        B = self.BLOCK
        N0, P0, off = fp.consts()
        ac = jnp.asarray(self.a_enc.reshape(1, -1))
        b3c = jnp.asarray(self.b3_enc.reshape(1, -1))
        a2c = jnp.asarray(self.a2_enc.reshape(1, -1))

        def kernel(x1, y1, z1, x2, y2, z2, n0, p0, offr, a_r, b3_r, a2_r,
                   ox, oy, oz):
            fld = (n0[:], p0[:], offr[:])
            consts = (a_r[:], b3_r[:], a2_r[:])
            R = _rcb_add(fp, consts, fld,
                         (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
            ox[:], oy[:], oz[:] = R

        spec = pl.BlockSpec((B, kp), lambda i: (i, 0))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((n, kp), jnp.float32)] * 3
        fn = pl.pallas_call(
            kernel,
            grid=(n // B,),
            in_specs=[spec] * 6 + [whole(N0), whole(P0), whole(off),
                                   whole(ac), whole(b3c), whole(a2c)],
            out_specs=[spec] * 3,
            out_shape=out_shape,
        )
        return tuple(fn(*P, *Q, N0, P0, off, ac, b3c, a2c))

    def double(self, P):
        return self.add(P, P)

    def neg(self, P):
        X, Y, Z = P
        return X, self.fp.neg(Y), Z

    def select(self, cond, P, Q):
        f = self.fp.select
        return (f(cond, P[0], Q[0]), f(cond, P[1], Q[1]),
                f(cond, P[2], Q[2]))


@lru_cache(maxsize=None)
def ec32_ctx(curve) -> EC32Ctx:
    return EC32Ctx(curve)
