"""Batched short-Weierstrass point arithmetic on device (SURVEY.md D3 —
data-plane EC ops feeding the MSM).

Points are projective (X, Y, Z) with coordinates as Montgomery limb tensors
(..., K); identity = (0, R mod p, 0) i.e. (0, 1, 0) in Montgomery form.
Addition is the Renes-Costello-Batina complete formula (the same algorithm
as the circuit gadget, pcd_tpu/gadgets/sw.py) — completeness means the MSM
scan needs no branches: identity, doubling, inverses all take the same path.
12 mont_muls + 2 constant muls per add.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .limbs import FpLimbCtx, ctx_for


class ECTensorCtx:
    def __init__(self, curve):
        """curve: host SWCurve over a prime field (G1 only for now)."""
        self.curve = curve
        self.fp: FpLimbCtx = ctx_for(curve.F.MODULUS)
        self.a_mont = np.asarray(self.fp.to_mont_host(curve.a.n))
        b3 = (curve.b.n * 3) % curve.F.MODULUS
        self.b3_mont = np.asarray(self.fp.to_mont_host(b3))

    # -- conversions ----------------------------------------------------
    def encode_points(self, pts) -> tuple:
        """host affine points -> (X, Y, Z) arrays (n, K); infinity allowed."""
        n = len(pts)
        k = self.fp.k
        X = np.zeros((n, k), dtype=np.uint32)
        Y = np.zeros((n, k), dtype=np.uint32)
        Z = np.zeros((n, k), dtype=np.uint32)
        one = self.fp.to_mont_host(1)
        for i, pt in enumerate(pts):
            if pt.is_infinity():
                Y[i] = one
            else:
                X[i] = self.fp.to_mont_host(pt.x.n)
                Y[i] = self.fp.to_mont_host(pt.y.n)
                Z[i] = one
        return X, Y, Z

    def decode_point(self, P):
        """(X, Y, Z) single point -> host SWPoint."""
        X, Y, Z = (np.asarray(c).reshape(-1) for c in P)
        xi, yi, zi = (self.fp.from_mont_limbs(c) for c in (X, Y, Z))
        if zi == 0:
            return self.curve.infinity()
        F = self.curve.F
        zinv = pow(zi, -1, self.fp.p)
        return self.curve.point(F(xi * zinv % self.fp.p),
                                F(yi * zinv % self.fp.p))

    def identity(self, shape=()):
        k = self.fp.k
        one = jnp.asarray(self.fp.one_mont)
        X = jnp.zeros(shape + (k,), dtype=jnp.uint32)
        Y = jnp.broadcast_to(one, shape + (k,)).astype(jnp.uint32)
        Z = jnp.zeros(shape + (k,), dtype=jnp.uint32)
        return X, Y, Z

    # -- complete addition (RCB15 alg 1) --------------------------------
    # Batched formulation: the 12 variable products run as 3 batched
    # mont_mul calls (stacked on a new leading axis) and the linear ops as
    # a handful of batched add/sub calls — this keeps the XLA graph small
    # (compile time) while the batch dimension keeps the VPU busy.
    def add(self, P, Q):
        fp = self.fp
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        a_c = jnp.asarray(self.a_mont)
        b3_c = jnp.asarray(self.b3_mont)
        a2_c = jnp.asarray(self.fp.to_mont_host(
            self.curve.a.n * self.curve.a.n % self.fp.p))

        st = jnp.stack
        # pre-sums: (X1+Y1, X2+Y2, X1+Z1, X2+Z2, Y1+Z1, Y2+Z2)
        s = fp.add(st([X1, X2, X1, X2, Y1, Y2]), st([Y1, Y2, Z1, Z2, Z1, Z2]))
        # MUL1: t0=X1X2, t1=Y1Y2, t2=Z1Z2, m3=s0*s1, m4=s2*s3, m5=s4*s5
        m = fp.mont_mul(jnp.concatenate([st([X1, Y1, Z1]), s[0::2]], axis=0),
                        jnp.concatenate([st([X2, Y2, Z2]), s[1::2]], axis=0))
        t0, t1, t2, m3, m4, m5 = m[0], m[1], m[2], m[3], m[4], m[5]
        # t3 = m3-t0-t1; t4 = m4-t0-t2; t5 = m5-t1-t2  (2 batched subs)
        u = fp.sub(st([m3, m4, m5]), st([t0, t0, t1]))
        v = fp.sub(u, st([t1, t2, t2]))
        t3, t4, t5 = v[0], v[1], v[2]
        # constant muls: a*t4, b3*t2, a*t2, b3*t4, a*t0, a^2*t2
        cm = fp.mont_mul(
            st([t4, t2, t2, t4, t0, t2]),
            jnp.stack([jnp.broadcast_to(c, t0.shape)
                       for c in (a_c, b3_c, a_c, b3_c, a_c, a2_c)]))
        at4, b3t2, at2, b3t4, at0, a2t2 = (cm[i] for i in range(6))
        Zp = fp.add(at4, b3t2)
        w = fp.sub(st([t1, at0, t0]), st([Zp, a2t2, jnp.zeros_like(t0)]))
        X3, t2n = w[0], w[1]
        y = fp.add(st([t1, t0, b3t4]), st([Zp, t0, t2n]))
        Z3, t0d, t4n = y[0], y[1], y[2]
        t1n = fp.add(fp.add(t0d, t0), at2)  # 3*t0 + a*t2
        # MUL2: X3*Z3, t1n*t4n, t3*X3, t5*t4n, t5*Z3, t3*t1n
        m2 = fp.mont_mul(st([X3, t1n, t3, t5, t5, t3]),
                         st([Z3, t4n, X3, t4n, Z3, t1n]))
        fin_a = fp.add(st([m2[0], m2[4]]), st([m2[1], m2[5]]))
        Y3, Z3o = fin_a[0], fin_a[1]
        X3o = fp.sub(m2[2], m2[3])
        return X3o, Y3, Z3o

    def double(self, P):
        return self.add(P, P)

    def neg(self, P):
        X, Y, Z = P
        return X, self.fp.neg(Y), Z

    def select(self, cond, P, Q):
        f = self.fp.select
        return (f(cond, P[0], Q[0]), f(cond, P[1], Q[1]), f(cond, P[2], Q[2]))

    def is_identity(self, P):
        return self.fp.is_zero(P[2])


@lru_cache(maxsize=None)
def ec_ctx(curve) -> ECTensorCtx:
    return ECTensorCtx(curve)
