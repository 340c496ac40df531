"""Batched short-Weierstrass point arithmetic on device (SURVEY.md D3 —
data-plane EC ops feeding the MSM), generic over the coordinate field.

A `FieldOps` adapter supplies batched modular arithmetic for either a prime
field (elements (..., K) limbs) or a binomial extension (elements
(..., D, K) — Karatsuba over the prime ops), so G1 (Fq) and G2 (Fq2/Fq3)
share the same complete-addition code.

Addition is Renes-Costello-Batina complete projective (identical algorithm
to the circuit gadget pcd_tpu/gadgets/sw.py); the 12 variable products run
as 3 batched mont_mul calls to keep the XLA graph small.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .limbs import FpLimbCtx, ctx_for


class FpOps:
    """Prime-field adapter: elements are (..., K) uint32 limb arrays."""

    def __init__(self, modulus: int):
        self.fp: FpLimbCtx = ctx_for(modulus)
        self.k = self.fp.k
        self.coord_shape = (self.fp.k,)

    def mont_mul(self, a, b):
        return self.fp.mont_mul(a, b)

    def add(self, a, b):
        return self.fp.add(a, b)

    def sub(self, a, b):
        return self.fp.sub(a, b)

    def neg(self, a):
        return self.fp.neg(a)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def encode_host(self, e) -> np.ndarray:
        return self.fp.to_mont_host(e.n)

    def decode_host(self, arr, F):
        return F(self.fp.from_mont_limbs(np.asarray(arr)))

    def zeros_np(self) -> np.ndarray:
        return np.zeros(self.coord_shape, dtype=np.uint32)

    def one_np(self) -> np.ndarray:
        return np.asarray(self.fp.one_mont)


class ExtOps:
    """Binomial-extension adapter: elements are (..., D, K); NR must lie in
    the prime subfield (true for the MNT towers: u^2=17, u^3=5)."""

    def __init__(self, modulus: int, degree: int, nr: int):
        self.fp: FpLimbCtx = ctx_for(modulus)
        self.d = degree
        self.k = self.fp.k
        self.coord_shape = (degree, self.fp.k)
        self.nr_mont = np.asarray(self.fp.to_mont_host(nr % modulus))

    # -- helpers ---------------------------------------------------------
    def _nr_mul(self, x):
        c = jnp.asarray(self.nr_mont)
        return self.fp.mont_mul(jnp.broadcast_to(c, x.shape), x)

    def mont_mul(self, a, b):
        fp = self.fp
        st = jnp.stack
        if self.d == 2:
            a0, a1 = a[..., 0, :], a[..., 1, :]
            b0, b1 = b[..., 0, :], b[..., 1, :]
            # Karatsuba: batch the 3 products in one call
            lhs = st([a0, a1, fp.add(a0, a1)])
            rhs = st([b0, b1, fp.add(b0, b1)])
            v = fp.mont_mul(lhs, rhs)
            v0, v1, mm = v[0], v[1], v[2]
            c0 = fp.add(v0, self._nr_mul(v1))
            c1 = fp.sub(fp.sub(mm, v0), v1)
            return jnp.stack([c0, c1], axis=-2)
        if self.d == 3:
            a0, a1, a2 = (a[..., i, :] for i in range(3))
            b0, b1, b2 = (b[..., i, :] for i in range(3))
            s = fp.add(st([a0, a0, a1, b0, b0, b1]),
                       st([a1, a2, a2, b1, b2, b2]))
            lhs = st([a0, a1, a2, s[0], s[1], s[2]])
            rhs = st([b0, b1, b2, s[3], s[4], s[5]])
            v = fp.mont_mul(lhs, rhs)
            v0, v1, v2, m01, m02, m12 = (v[i] for i in range(6))
            c0 = fp.add(v0, self._nr_mul(fp.sub(fp.sub(m12, v1), v2)))
            c1 = fp.add(fp.sub(fp.sub(m01, v0), v1), self._nr_mul(v2))
            c2 = fp.add(fp.sub(fp.sub(m02, v0), v2), v1)
            return jnp.stack([c0, c1, c2], axis=-2)
        raise NotImplementedError(self.d)

    def add(self, a, b):
        return self.fp.add(a, b)  # broadcasts over the D axis

    def sub(self, a, b):
        return self.fp.sub(a, b)

    def neg(self, a):
        return self.fp.neg(a)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def encode_host(self, e) -> np.ndarray:
        return np.stack([self.fp.to_mont_host(c.n) for c in e.c])

    def decode_host(self, arr, F):
        arr = np.asarray(arr)
        prime = F.prime_subfield()
        return F([prime(self.fp.from_mont_limbs(arr[i]))
                  for i in range(self.d)])

    def zeros_np(self) -> np.ndarray:
        return np.zeros(self.coord_shape, dtype=np.uint32)

    def one_np(self) -> np.ndarray:
        out = np.zeros(self.coord_shape, dtype=np.uint32)
        out[0] = self.fp.one_mont
        return out


def field_ops_for(F):
    """Host field class -> FieldOps adapter."""
    deg = F.extension_degree_over_prime()
    prime = F.prime_subfield()
    if deg == 1:
        return FpOps(prime.MODULUS)
    nr = F.NR
    assert hasattr(nr, "n") or nr.to_prime_coeffs()[1:] == []
    nr_int = nr.n if hasattr(nr, "n") else nr.to_prime_coeffs()[0].n
    return ExtOps(prime.MODULUS, deg, nr_int)


class ECTensorCtx:
    def __init__(self, curve):
        """curve: host SWCurve (coordinate field prime or extension)."""
        self.curve = curve
        self.f = field_ops_for(curve.F)
        self.fp = self.f.fp  # prime limb ctx (for scalar-side helpers)
        self.a_enc = self.f.encode_host(curve.a)
        b3 = curve.b + curve.b + curve.b
        self.b3_enc = self.f.encode_host(b3)
        a2 = curve.a * curve.a
        self.a2_enc = self.f.encode_host(a2)

    # -- conversions ----------------------------------------------------
    def encode_points(self, pts) -> tuple:
        n = len(pts)
        sh = (n,) + self.f.coord_shape
        X = np.zeros(sh, dtype=np.uint32)
        Y = np.zeros(sh, dtype=np.uint32)
        Z = np.zeros(sh, dtype=np.uint32)
        one = self.f.one_np()
        for i, pt in enumerate(pts):
            if pt.is_infinity():
                Y[i] = one
            else:
                X[i] = self.f.encode_host(pt.x)
                Y[i] = self.f.encode_host(pt.y)
                Z[i] = one
        return X, Y, Z

    def decode_point(self, P):
        X, Y, Z = (np.asarray(c).reshape(self.f.coord_shape) for c in P)
        F = self.curve.F
        x = self.f.decode_host(X, F)
        y = self.f.decode_host(Y, F)
        z = self.f.decode_host(Z, F)
        if z.is_zero():
            return self.curve.infinity()
        zi = z.inv()
        return self.curve.point(x * zi, y * zi)

    def identity(self, shape=()):
        sh = shape + self.f.coord_shape
        X = jnp.zeros(sh, dtype=jnp.uint32)
        Y = jnp.broadcast_to(jnp.asarray(self.f.one_np()), sh).astype(jnp.uint32)
        Z = jnp.zeros(sh, dtype=jnp.uint32)
        return X, Y, Z

    # -- complete addition (RCB15 alg 1; batched products) ----------------
    def add(self, P, Q):
        f = self.f
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        a_c = jnp.asarray(self.a_enc)
        b3_c = jnp.asarray(self.b3_enc)
        a2_c = jnp.asarray(self.a2_enc)
        st = jnp.stack

        s = f.add(st([X1, X2, X1, X2, Y1, Y2]), st([Y1, Y2, Z1, Z2, Z1, Z2]))
        m = f.mont_mul(jnp.concatenate([st([X1, Y1, Z1]), s[0::2]], axis=0),
                       jnp.concatenate([st([X2, Y2, Z2]), s[1::2]], axis=0))
        t0, t1, t2, m3, m4, m5 = (m[i] for i in range(6))
        u = f.sub(st([m3, m4, m5]), st([t0, t0, t1]))
        v = f.sub(u, st([t1, t2, t2]))
        t3, t4, t5 = v[0], v[1], v[2]
        cm = f.mont_mul(
            st([t4, t2, t2, t4, t0, t2]),
            st([jnp.broadcast_to(c, t0.shape)
                for c in (a_c, b3_c, a_c, b3_c, a_c, a2_c)]))
        at4, b3t2, at2, b3t4, at0, a2t2 = (cm[i] for i in range(6))
        Zp = f.add(at4, b3t2)
        w = f.sub(st([t1, at0]), st([Zp, a2t2]))
        X3, t2n = w[0], w[1]
        y = f.add(st([t1, t0, b3t4]), st([Zp, t0, t2n]))
        Z3, t0d, t4n = y[0], y[1], y[2]
        t1n = f.add(f.add(t0d, t0), at2)
        m2 = f.mont_mul(st([X3, t1n, t3, t5, t5, t3]),
                        st([Z3, t4n, X3, t4n, Z3, t1n]))
        fin = f.add(st([m2[0], m2[4]]), st([m2[1], m2[5]]))
        Y3, Z3o = fin[0], fin[1]
        X3o = f.sub(m2[2], m2[3])
        return X3o, Y3, Z3o

    def double(self, P):
        return self.add(P, P)

    def neg(self, P):
        X, Y, Z = P
        return X, self.f.neg(Y), Z

    def select(self, cond, P, Q):
        f = self.f.select
        return (f(cond, P[0], Q[0]), f(cond, P[1], Q[1]), f(cond, P[2], Q[2]))

    def is_identity(self, P):
        return self.f.is_zero(P[2])


@lru_cache(maxsize=None)
def ec_ctx(curve) -> ECTensorCtx:
    return ECTensorCtx(curve)
