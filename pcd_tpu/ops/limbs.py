"""Device (JAX) multi-precision modular arithmetic: the data-plane field
layer (SURVEY.md D1 — TPU-native replacement for ark-ff's Montgomery
arithmetic).

Representation: little-endian 16-bit limbs in uint32 lanes, shape (..., K),
K = ceil(bits/16).  16x16 products are exact in uint32; CIOS accumulators
stay below 2^23 so no intermediate carries are needed.

Compiler-friendliness: all sequential structures (CIOS limb loop, carry /
borrow propagation, Fermat inversion) are expressed with lax.scan /
lax.fori_loop so the traced graph is O(1) in the limb count and in the
exponent size — XLA compile time stays flat while the batch dimension
carries the parallelism.  (A fully unrolled formulation compiled ~1.5 s
*per* multiplication under XLA-CPU; this version compiles in milliseconds
and runs identically.)

Montgomery form: R = 2^(16 K); canonical representatives in [0, p).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, k: int) -> np.ndarray:
    out = np.zeros(k, dtype=np.uint32)
    for i in range(k):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    assert x >> (LIMB_BITS * k) == 0, "value too large for limb count"
    return out


def limbs_to_int(a) -> int:
    a = np.asarray(a).reshape(-1)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a))


def ints_to_limbs_np(xs, k: int) -> np.ndarray:
    """Vectorized int -> 16-bit-limb conversion via the bytes fast path
    (int.to_bytes is C-speed; the Python-loop version costs ~100x more)."""
    nb = 2 * k
    buf = b"".join(int(x).to_bytes(nb, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), k)
    return arr.astype(np.uint32)


def limbs_to_ints_np(arr) -> list:
    """Vectorized limb-array -> int list (inverse of ints_to_limbs_np)."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint32))
    n, k = arr.shape
    u2 = arr.astype("<u2")
    buf = u2.tobytes()
    nb = 2 * k
    return [int.from_bytes(buf[i * nb : (i + 1) * nb], "little")
            for i in range(n)]


def _carry_scan(t):
    """Full carry propagation along the last axis (lax.scan)."""
    xs = jnp.moveaxis(t, -1, 0)

    def body(carry, x):
        v = x + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    _, out = jax.lax.scan(body, jnp.zeros(xs.shape[1:], dtype=jnp.uint32), xs)
    return jnp.moveaxis(out, 0, -1)


class FpLimbCtx:
    """Montgomery context for one prime modulus."""

    def __init__(self, modulus: int):
        self.p = modulus
        self.bits = modulus.bit_length()
        self.k = (self.bits + LIMB_BITS - 1) // LIMB_BITS
        self.R = 1 << (LIMB_BITS * self.k)
        assert self.R > modulus
        self.r_mod_p = self.R % modulus
        self.r2_mod_p = self.R * self.R % modulus
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) & LIMB_MASK
        self.p_limbs = int_to_limbs(modulus, self.k)
        self.one_mont = int_to_limbs(self.r_mod_p, self.k)
        self.zero = np.zeros(self.k, dtype=np.uint32)
        # p-2 bits (LSB-first) for Fermat inversion
        e = modulus - 2
        self.pm2_bits = np.array([(e >> i) & 1 for i in range(self.bits)],
                                 dtype=np.uint32)

    # -- host conversions ----------------------------------------------
    def to_mont_host(self, x: int) -> np.ndarray:
        return int_to_limbs(x * self.R % self.p, self.k)

    def encode(self, xs) -> np.ndarray:
        R, p = self.R, self.p
        return ints_to_limbs_np([int(x) * R % p for x in xs], self.k)

    def from_mont_limbs(self, a) -> int:
        return limbs_to_int(a) * pow(self.R, -1, self.p) % self.p

    def decode(self, arr) -> list:
        arr = np.asarray(arr).reshape(-1, self.k)
        rinv = pow(self.R, -1, self.p)
        p = self.p
        return [v * rinv % p for v in limbs_to_ints_np(arr)]

    # -- device ops -----------------------------------------------------
    def mont_mul(self, a, b):
        """(..., K) x (..., K) -> a*b*R^-1 mod p, canonical in [0, p)."""
        k = self.k
        p_l = jnp.asarray(self.p_limbs)
        n0 = jnp.uint32(self.n0inv)
        bsh = jnp.broadcast_arrays(a, b)
        a, b = bsh

        t0 = jnp.zeros(a.shape[:-1] + (k + 2,), dtype=jnp.uint32)

        def body(i, t):
            ai = jax.lax.dynamic_index_in_dim(a, i, axis=-1, keepdims=True)
            prod = ai * b
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            t = t.at[..., :k].add(lo)
            t = t.at[..., 1 : k + 1].add(hi)
            m = ((t[..., 0] & LIMB_MASK) * n0) & LIMB_MASK
            mp = m[..., None] * p_l
            t = t.at[..., :k].add(mp & LIMB_MASK)
            t = t.at[..., 1 : k + 1].add(mp >> LIMB_BITS)
            carry = t[..., 0] >> LIMB_BITS
            t = jnp.concatenate(
                [
                    (t[..., 1:2] + carry[..., None]),
                    t[..., 2:],
                    jnp.zeros_like(t[..., :1]),
                ],
                axis=-1,
            )
            return t

        t = jax.lax.fori_loop(0, k, body, t0, unroll=False)
        return self._normalize_cond_sub(t)

    def _normalize_cond_sub(self, t):
        """t: (..., m) raw accumulators (< 2^32/lane) holding a value < 2p.
        One fused scan: normalize carries AND compute s - p; select s >= p.
        Returns first k limbs, canonical."""
        m = t.shape[-1]
        p_ext = np.zeros(m, dtype=np.uint32)
        p_ext[: self.k] = self.p_limbs
        xs = jnp.moveaxis(t, -1, 0)
        ps = jnp.asarray(p_ext)

        def body(state, x_i):
            x, pi = x_i
            carry, borrow = state
            v = x + carry
            s = v & LIMB_MASK
            carry = v >> LIMB_BITS
            d = s + (LIMB_MASK + 1) - pi - borrow
            tt = d & LIMB_MASK
            borrow = 1 - (d >> LIMB_BITS)
            return (carry, borrow), (s, tt)

        init = (jnp.zeros(xs.shape[1:], dtype=jnp.uint32),
                jnp.zeros(xs.shape[1:], dtype=jnp.uint32))
        (carry_f, borrow_f), (s, tt) = jax.lax.scan(
            body, init, (xs, jnp.broadcast_to(
                ps.reshape((m,) + (1,) * (xs.ndim - 1)), xs.shape)))
        s = jnp.moveaxis(s, 0, -1)
        tt = jnp.moveaxis(tt, 0, -1)
        need = borrow_f == 0  # s >= p
        return jnp.where(need[..., None], tt, s)[..., : self.k].astype(jnp.uint32)

    def add(self, a, b):
        """(a + b) mod p for canonical inputs — one fused scan."""
        s = a + b  # <= 2*(2^16-1), exact
        s = jnp.concatenate([s, jnp.zeros_like(s[..., :1])], axis=-1)
        return self._normalize_cond_sub(s)

    def sub(self, a, b):
        """(a - b) mod p for canonical inputs — one fused scan computing
        r = a - b and r + p, selecting on the final borrow."""
        xs_a = jnp.moveaxis(a, -1, 0)
        xs_b = jnp.moveaxis(b, -1, 0)
        p_l = jnp.asarray(self.p_limbs)
        ps = jnp.broadcast_to(
            p_l.reshape((self.k,) + (1,) * (xs_a.ndim - 1)), xs_a.shape)

        def body(state, abp):
            ai, bi, pi = abp
            borrow, carry = state
            d = ai + (LIMB_MASK + 1) - bi - borrow
            r = d & LIMB_MASK
            borrow = 1 - (d >> LIMB_BITS)
            u = r + pi + carry
            rp = u & LIMB_MASK
            carry = u >> LIMB_BITS
            return (borrow, carry), (r, rp)

        init = (jnp.zeros(xs_a.shape[1:], dtype=jnp.uint32),
                jnp.zeros(xs_a.shape[1:], dtype=jnp.uint32))
        (borrow_f, _), (r, rp) = jax.lax.scan(body, init, (xs_a, xs_b, ps))
        r = jnp.moveaxis(r, 0, -1)
        rp = jnp.moveaxis(rp, 0, -1)
        return jnp.where((borrow_f != 0)[..., None], rp, r).astype(jnp.uint32)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)

    def to_mont(self, a_raw):
        r2 = jnp.asarray(int_to_limbs(self.r2_mod_p, self.k))
        return self.mont_mul(a_raw, jnp.broadcast_to(r2, a_raw.shape))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    def inv_mont(self, a):
        """Batched Fermat inversion a^(p-2) via fori_loop over constant
        exponent bits (LSB-first square-and-multiply)."""
        bits = jnp.asarray(self.pm2_bits)
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)

        def body(i, state):
            result, base = state
            mul = self.mont_mul(result, base)
            result = self.select(bits[i] != 0, mul, result)
            base = self.mont_sqr(base)
            return result, base

        result, _ = jax.lax.fori_loop(0, len(self.pm2_bits), body, (one, a))
        return result

    def pow_const(self, a, e: int):
        """a^e for a small constant exponent (unrolled; use for tiny e)."""
        result = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        base = a
        while e:
            if e & 1:
                result = self.mont_mul(result, base)
            e >>= 1
            if e:
                base = self.mont_sqr(base)
        return result


@lru_cache(maxsize=None)
def ctx_for(modulus: int) -> FpLimbCtx:
    return FpLimbCtx(modulus)
