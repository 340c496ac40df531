"""f32/8-bit-limb modular arithmetic with fused Pallas kernels — the MSM
speed-of-light path (docs/DESIGN.md roadmap items 1-2; VERDICT round-2
item 2).

Why not u32 limbs: the TPU VPU has no fast 32-bit integer multiply (XLA
emulates it), which capped the u16-limb CIOS path (ops/limbs.py) at
~43 M mont_mul/s.  This module instead uses:

  - 8-bit limbs held in f32 lanes: 8x8-bit products are exact in f32, and
    sums of <= 39 of them stay below 2^24 (f32's exact-integer range);
  - Montgomery reduction by CONSTANTS (N' = -p^-1 mod R, p itself) as two
    bf16 matmuls with constant Toeplitz matrices -> they ride the MXU;
  - a lazy mod-p value class: elements live in [~0, c*p) for small c with
    "quasi-settled" limbs in [-1, 256] -- no comparisons or conditional
    subtracts anywhere in the hot path (the lane-parallel carry settle is
    3 shift-add rounds, value-exact);
  - one fused Pallas kernel per EC add: all 12 field products and every
    intermediate stay in VMEM, eliminating the HBM round-trips that made
    the u32 path memory-bound.

Layout: an Fp element batch is (n, KP) f32, limb i in lane i (LSB first),
K = 39 limbs (R = 2^312 > 4p^2-safe for 298-bit p), padded to KP = 40.
Montgomery form: stored value = x * R mod p (+ multiples of p; lazy).

Correctness envelope (checked in tests/test_fp32.py):
  - mul inputs may be any value < 117*p with limbs in [-1, 256]
    (c^2 * p < R  =>  c <= 117 for MNT-298); outputs < 1.01 p + p = 2p-ish
  - adds/subs of a handful of mul outputs stay far below the bound
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

LB = 8                       # limb bits
BASE = 1 << LB               # 256
INV_BASE = 1.0 / BASE


def _int_to_f32_limbs(x: int, k: int) -> np.ndarray:
    out = np.zeros(k, dtype=np.float32)
    for i in range(k):
        out[i] = (x >> (LB * i)) & (BASE - 1)
    assert x >> (LB * k) == 0
    return out


def ints_to_f32_limbs_np(xs, k: int) -> np.ndarray:
    buf = b"".join(int(x).to_bytes(k, "little") for x in xs)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), k)
    return arr.astype(np.float32)


def f32_limbs_to_ints_np(arr) -> list:
    """Quasi-settled (limbs may be -1..256 or larger) -> exact ints."""
    arr = np.asarray(arr, dtype=np.float64)
    n, k = arr.shape
    out = []
    for r in range(n):
        v = 0
        for i in range(k):
            v += int(arr[r, i]) << (LB * i)
        out.append(v)
    return out


class Fp32Ctx:
    """Per-modulus constants for the f32 path."""

    def __init__(self, modulus: int):
        self.p = modulus
        bits = modulus.bit_length()
        self.k = (bits + LB - 1) // LB + 1   # one extra limb: R = 2^(8k)
        self.kp = (self.k + 7) // 8 * 8      # pad to multiple of 8 lanes
        self.k2 = 2 * self.k
        self.k2p = (self.k2 + 2 + 7) // 8 * 8  # spare top lanes for carries
        self.R = 1 << (LB * self.k)
        assert self.R > 16 * modulus * modulus // self.R, "R too small"
        self.nprime = (-pow(modulus, -1, self.R)) % self.R
        self.p_limbs = _int_to_f32_limbs(modulus, self.k)
        self.np_limbs = _int_to_f32_limbs(self.nprime, self.k)
        # Toeplitz matrices for the two constant multiplies (bf16-exact:
        # entries are 8-bit)
        # m = (t_lo * N') mod R : N0[i, j] = n'_{j-i}  (j >= i), (k, k)
        N0 = np.zeros((self.kp, self.kp), dtype=np.float32)
        for i in range(self.k):
            for j in range(i, self.k):
                N0[i, j] = self.np_limbs[j - i]
        self.N0 = N0
        # mp = m * p : P0[i, j] = p_{j-i}, (k, 2k)
        P0 = np.zeros((self.kp, self.k2p), dtype=np.float32)
        for i in range(self.k):
            for j in range(self.k):
                P0[i, i + j] = self.p_limbs[j]
        self.P0 = P0
        self.r_mod_p = self.R % modulus
        self.one_mont = _int_to_f32_limbs(self.r_mod_p, self.k)

    # -- host conversions -------------------------------------------------
    def encode(self, xs) -> np.ndarray:
        R, p, = self.R, self.p
        arr = ints_to_f32_limbs_np([int(x) * R % p for x in xs], self.k)
        if self.kp > self.k:
            arr = np.pad(arr, [(0, 0), (0, self.kp - self.k)])
        return arr

    def decode(self, arr) -> list:
        rinv = pow(self.R, -1, self.p)
        p = self.p
        return [v * rinv % p for v in f32_limbs_to_ints_np(np.asarray(arr))]

    def zeros(self, shape=()):
        return jnp.zeros(shape + (self.kp,), dtype=jnp.float32)

    def one(self, shape=()):
        o = np.zeros(self.kp, dtype=np.float32)
        o[: self.k] = self.one_mont
        return jnp.broadcast_to(jnp.asarray(o), shape + (self.kp,))

    # ======================================================================
    # In-graph math (usable inside Pallas kernels AND in plain jnp).
    # Pallas forbids captured array constants, so the reduction matrices
    # and the 4p offset are explicit optional arguments; the plain path
    # defaults them from host constants.
    # ======================================================================
    def consts(self):
        """(N0 bf16, P0 bf16, off4p f32(1,KP)) as jnp arrays — pass these
        into Pallas kernels and through to mul/sub/neg."""
        return (jnp.asarray(self.N0, dtype=jnp.bfloat16),
                jnp.asarray(self.P0, dtype=jnp.bfloat16),
                jnp.asarray(self.off4p().reshape(1, -1)))

    def settle(self, v, rounds: int = 3):
        """3 shift-add carry rounds: limbs -> [-1, 256], value-exact.
        The top lane must be free (values never carry out of the array)."""
        for _ in range(rounds):
            c = jnp.floor(v * INV_BASE)
            r = v - c * BASE
            v = r + jnp.concatenate(
                [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
        return v

    def mul(self, a, b, N0=None, P0=None):
        """Montgomery product over (n, KP) f32 quasi-settled inputs."""
        k, kp, k2p = self.k, self.kp, self.k2p
        if N0 is None:
            N0 = jnp.asarray(self.N0, dtype=jnp.bfloat16)
        if P0 is None:
            P0 = jnp.asarray(self.P0, dtype=jnp.bfloat16)
        a, b = jnp.broadcast_arrays(a, b)
        # schoolbook t = a * b  (exact: |limbs| <= 256, sums < 2^24).
        # Static concatenation shifts only: Pallas TPU has no dynamic_slice.
        t = jnp.zeros(a.shape[:-1] + (k2p,), dtype=jnp.float32)
        zcol = jnp.zeros(a.shape[:-1] + (1,), dtype=jnp.float32)
        for i in range(k):
            prod = a[..., i : i + 1] * b[..., :kp]
            if i:
                prod = jnp.concatenate(
                    [jnp.broadcast_to(zcol, a.shape[:-1] + (i,)), prod],
                    axis=-1)
            pad_r = k2p - prod.shape[-1]
            if pad_r:
                prod = jnp.concatenate(
                    [prod,
                     jnp.broadcast_to(zcol, a.shape[:-1] + (pad_r,))],
                    axis=-1)
            t = t + prod
        t = self.settle(t)
        # m = (t mod R) * N' mod R  -- constant matmul on the MXU
        t_lo = t[..., :kp]
        m = jnp.dot(t_lo.astype(jnp.bfloat16), N0,
                    preferred_element_type=jnp.float32)
        m = self.settle(m)
        # mod R: zero the spill lanes (2-D iota — TPU/Pallas-safe)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
        m = m * (lane < k).astype(jnp.float32)
        # t + m*p  -- second constant matmul
        mp = jnp.dot(m.astype(jnp.bfloat16), P0,
                     preferred_element_type=jnp.float32)
        s = self.settle(t + mp)
        # exact divide by R: low k limbs of s represent carry*R with
        # carry in {-1,0,1}; only the top few low limbs matter numerically
        carry = jnp.floor(
            s[..., k - 1 : k] * INV_BASE
            + s[..., k - 2 : k - 1] * (INV_BASE ** 2)
            + s[..., k - 3 : k - 2] * (INV_BASE ** 3) + 0.5)
        hi = s[..., k : k + kp]
        carry_vec = jnp.concatenate(
            [carry, jnp.zeros(carry.shape[:-1] + (kp - 1,),
                              dtype=jnp.float32)], axis=-1)
        return hi + carry_vec

    def add(self, a, b):
        return self.settle(a + b, rounds=1)

    def sub(self, a, b, off=None):
        """a - b + 4p (keeps values positive; lazy class)."""
        if off is None:
            off = jnp.asarray(self.off4p())
        return self.settle(a - b + off, rounds=2)

    def neg(self, a, off=None):
        if off is None:
            off = jnp.asarray(self.off4p())
        return self.settle(off - a, rounds=2)

    @lru_cache(maxsize=None)
    def off4p(self):
        arr = _int_to_f32_limbs(4 * self.p, self.k + 1)
        out = np.zeros(self.kp, dtype=np.float32)
        out[: self.k + 1] = arr
        assert self.k + 1 <= self.kp
        return out

    def select(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)

    # ======================================================================
    # Transposed variants: arrays are (K, B) — limbs on SUBLANES, batch on
    # lanes.  Dense vregs (B a multiple of 128) and row-wise carry/convolve
    # shifts instead of expensive lane concatenates.  Used inside the
    # fused Pallas kernels; same math, same exactness envelope.
    # ======================================================================
    def settleT(self, v, rounds: int = 3):
        for _ in range(rounds):
            c = jnp.floor(v * INV_BASE)
            r = v - c * BASE
            v = r + jnp.concatenate(
                [jnp.zeros_like(c[:1, :]), c[:-1, :]], axis=0)
        return v

    def constsT(self):
        """(N0T bf16 (K,K), P0T bf16 (2K,K), off4p (K,1)) for the
        transposed kernels."""
        return (jnp.asarray(self.N0.T.copy(), dtype=jnp.bfloat16),
                jnp.asarray(self.P0.T.copy(), dtype=jnp.bfloat16),
                jnp.asarray(self.off4p().reshape(-1, 1)))

    def mulT_raw_ns(self, a, b):
        """Schoolbook wide product, operands (K, B) -> UNSETTLED (2K, B):
        exact f32 integers with entries < ~2^23 (inputs may have limbs up
        to ~700 in magnitude; 39*700^2 < 2^24.2 would break exactness, so
        the widened quasi-settled class is capped at |limb| <= 640)."""
        k, kp, k2p = self.k, self.kp, self.k2p
        a, b = jnp.broadcast_arrays(a, b)
        nb = a.shape[-1]
        zrow = jnp.zeros((1, nb), dtype=jnp.float32)
        t = jnp.zeros((k2p, nb), dtype=jnp.float32)
        for i in range(k):
            prod = a[i : i + 1, :] * b[:kp, :]
            if i:
                prod = jnp.concatenate(
                    [jnp.broadcast_to(zrow, (i, nb)), prod], axis=0)
            pad_r = k2p - prod.shape[0]
            if pad_r:
                prod = jnp.concatenate(
                    [prod, jnp.broadcast_to(zrow, (pad_r, nb))], axis=0)
            t = t + prod
        return t

    def mulT_raw(self, a, b):
        """Schoolbook wide product, one carry round: limbs of the result
        are in [~-80, ~10k] (still f32-exact); extension-field callers
        combine such wides (Karatsuba / nr-scaling by <= 17) safely below
        2^24 and redcT's split reduction takes any f32-exact wide."""
        return self.settleT(self.mulT_raw_ns(a, b), rounds=1)

    def _split3(self, v, rows):
        """Exact base-256 3-part decomposition of an f32-exact integer
        vector: v == r + shift1(c0) + shift2(c1) with r, c0 in [0, 255]
        and |c1| small — every part exact in bfloat16.  Replaces two
        settle rounds ahead of each constant matmul (the bf16 operands
        need strict 8-bit limbs; the split gets there in 5 VPU ops
        instead of 10 and needs no carry chain)."""
        c = jnp.floor(v * INV_BASE)
        r = v - c * BASE
        c1 = jnp.floor(c * INV_BASE)
        c0 = c - c1 * BASE
        nb = v.shape[-1]
        z1 = jnp.zeros((1, nb), dtype=jnp.float32)
        z2 = jnp.zeros((2, nb), dtype=jnp.float32)
        c0s = jnp.concatenate([z1, c0[: rows - 1, :]], axis=0)
        c1s = jnp.concatenate([z2, c1[: rows - 2, :]], axis=0)
        return r[:rows, :], c0s, c1s

    def redcT(self, t, N0T, P0T):
        """Montgomery-reduce a wide value t (2K, B) -> (K, B).  t may be
        RAW (unsettled): any f32-exact integer limb vector with value in
        [0, ~R*p) works — the base-256 3-way split feeds the N' matmul
        with strict-8-bit parts (three small MXU matmuls replace one
        matmul behind a 3-round carry chain), and the final sum pays a
        2-round settle.  m itself IS fully settled + masked before the
        m*p matmul: m must be < ~R (a lazier representative reaches 3R
        and inflates every mul output from 2p to 4p, blowing the madd
        lazy-class envelopes).  Output limbs in [-1, ~380]."""
        k, kp = self.k, self.kp
        nb = t.shape[-1]

        def dot3(M, parts):
            acc = None
            for pt in parts:
                d = jnp.dot(M, pt.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            return acc

        # m = (t mod R) * N' mod R: any limb representation of t mod R
        # gives a valid m (everything is mod R)
        m = dot3(N0T, self._split3(t, kp))
        m = self.settleT(m)          # strict limbs: masked value < 1.004R
        row = (jax.lax.broadcasted_iota(jnp.int32, (kp, 1), 0)
               < k).astype(jnp.float32)
        m = m * row
        mp = jnp.dot(P0T, m.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        s = self.settleT(t + mp, rounds=2)
        carry = jnp.floor(
            s[k - 1 : k, :] * INV_BASE
            + s[k - 2 : k - 1, :] * (INV_BASE ** 2)
            + s[k - 3 : k - 2, :] * (INV_BASE ** 3) + 0.5)
        hi = s[k : k + kp, :]
        carry_rows = jnp.concatenate(
            [carry, jnp.zeros((kp - 1, nb), dtype=jnp.float32)], axis=0)
        return hi + carry_rows

    def mulT(self, a, b, N0T, P0T):
        """Montgomery product, operands (K, B)."""
        return self.redcT(self.mulT_raw_ns(a, b), N0T, P0T)

    @lru_cache(maxsize=None)
    def wide_p_offset(self):
        """(K2P,) f32 limbs of 512*p^2 — a wide multiple of p added to
        Karatsuba middle terms so wide subtractions stay nonnegative
        (512 p^2 >> any sum of wide products of lazy-class inputs, and
        the Montgomery bound 512+eps << R/p ~ 14000 holds)."""
        out = np.zeros(self.k2p, dtype=np.float32)
        v = 512 * self.p * self.p
        for i in range(self.k2p):
            out[i] = (v >> (LB * i)) & (BASE - 1)
        assert v >> (LB * self.k2p) == 0
        return out

    def addT(self, a, b):
        return self.settleT(a + b, rounds=1)

    def subT(self, a, b, off):
        return self.settleT(a - b + off, rounds=2)

    # -- constant multiplication (stream-MSM mixed-add path) --------------
    def const_toeplitz_T(self, c_mont: int) -> np.ndarray:
        """(K2P, KP) f32 Toeplitz of a Montgomery-form constant:
        wide = dot(CT, x) computes the schoolbook product c~ * x entirely
        on the MXU (entries are 8-bit, bf16-exact) — one matmul replaces
        the K-row shifted-FMA schoolbook for multiply-by-constant."""
        limbs = _int_to_f32_limbs(c_mont, self.k)
        CT = np.zeros((self.k2p, self.kp), dtype=np.float32)
        for j in range(self.k):
            for i in range(self.k):
                CT[i + j, i] = limbs[j]
        return CT

    def cmulT(self, CT, x, N0T, P0T):
        """Montgomery product by a constant via its Toeplitz matrix.
        x is quasi-settled (K, B); inputs are re-settled to the strict
        [-1, 256] class before the bf16 cast (bf16 is exact only there)."""
        xs = self.settleT(x, rounds=2)
        wide = jnp.dot(CT.astype(jnp.bfloat16) if CT.dtype != jnp.bfloat16
                       else CT, xs.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return self.redcT(wide, N0T, P0T)

    def smulT(self, v: float, x):
        """Multiply by a SMALL integer constant (<= ~2^11) on the VPU:
        v * x~ = (v*x)~ — scalar multiply preserves the Montgomery
        representative exactly in f32 for |limbs| <= 257."""
        return self.settleT(x * v, rounds=2)

    @lru_cache(maxsize=None)
    def off_mult_p(self, mult: int) -> np.ndarray:
        """(KP,) settled f32 limbs of mult*p — subtraction offsets for the
        wider lazy-class values of the mixed-add path (mult in {4,32,96})."""
        v = mult * self.p
        k_need = (v.bit_length() + LB - 1) // LB
        assert k_need <= self.kp
        out = np.zeros(self.kp, dtype=np.float32)
        out[:k_need] = _int_to_f32_limbs(v, k_need)
        return out


@lru_cache(maxsize=None)
def fp32_ctx(modulus: int) -> Fp32Ctx:
    return Fp32Ctx(modulus)
