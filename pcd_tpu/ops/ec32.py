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


class _MaddSpec:
    """Constant-multiply strategy + lazy-class offsets for the mixed-add
    (Z2=1) kernel.  Small curve constants (MNT4 a=2, MNT6 a=11) multiply
    on the VPU as exact f32 scalar products; large ones (b3, MNT6 a^2)
    ride the MXU as Montgomery Toeplitz matmuls (output ~p).  Offsets are
    sized from the resulting worst-case value bounds (in units of p) and
    the whole envelope is asserted < 110p (the f32 class limit is 117p)."""

    SMALL_MAX = 11

    def __init__(self, fp, a_int: int, b3_int: int, a2_int: int):
        self.fp = fp

        def plan(v):
            if 0 <= v <= self.SMALL_MAX:
                return ("s", float(v), None)
            cm = v * fp.R % fp.p
            return ("m", None, fp.const_toeplitz_T(cm))

        self.a = plan(a_int)
        self.b3 = plan(b3_int)
        self.a2 = plan(a2_int)
        # value bounds in units of p: acc coords <= 6, table coords < 1,
        # sign-negated Y < 4, mul outputs <= 2, cmul 'm' outputs <= 2
        ACC = 6.0
        T4 = 2.0 + ACC                       # mul(X2,Z1) + X1

        def cbound(spec, x):
            return spec[1] * x if spec[0] == "s" else 2.0

        zp = cbound(self.a, T4) + cbound(self.b3, ACC)
        self.offX3 = self._pick_off(zp)
        x3 = 2.0 + self.offX3
        z3 = 2.0 + zp
        t2n_sub = cbound(self.a2, ACC)
        self.offT2n = self._pick_off(t2n_sub)
        t2n = cbound(self.a, 2.0) + self.offT2n
        t4n = cbound(self.b3, T4) + t2n
        t1n = 6.0 + cbound(self.a, ACC)
        for v in (x3, z3, t4n, t1n, T4, zp + 2.0):
            assert v < 110.0, f"madd lazy-class bound exceeded: {v}p"
        # Montgomery wide-product bound: X3*Z3 is the largest product
        assert x3 * z3 < 110.0 * 110.0

    @staticmethod
    def _pick_off(bound: float) -> int:
        for m in (4, 8, 16, 32, 96):
            if m >= bound + 2.0:
                return m
        raise AssertionError(f"no offset covers {bound}p")


def _rcb_maddT(fp: Fp32Ctx, spec: _MaddSpec, carr, fld, P, Q,
               sign_row, act_row):
    """Complete MIXED addition (RCB15, Z2=1) in the transposed layout:
    acc P = (X1,Y1,Z1) projective (K,B), Q = (X2,Y2) affine table coords,
    sign_row/act_row (1,B) f32 flags.  Returns the masked-select new acc.
    carr: {'offX3','offT2n': (K,B) rows, 'a'/'b3'/'a2': Toeplitz arrays
    for the matmul-planned constants}; fld = (N0T, P0T, off4)."""
    off4 = fld[2]
    X2, Y2 = Q
    # signed digit: gathered point negated in-kernel (y -> 4p - y)
    Y2n = fp.settleT(off4 - Y2, rounds=2)
    Y2 = jnp.where(sign_row > 0, Y2n, Y2)
    return _rcb_maddT_ns(fp, spec, carr, fld, P, (X2, Y2), act_row)


def _rcb_maddT_ns(fp: Fp32Ctx, spec: _MaddSpec, carr, fld, P, Q, act_row):
    """_rcb_maddT with the digit sign already applied to Y2 (the stream
    pipeline pre-negates the whole gathered tile in one vectorized pass)."""
    N0T, P0T, off4 = fld
    X1, Y1, Z1 = P
    X2, Y2 = Q

    def mul(a, b):
        return fp.mulT(a, b, N0T, P0T)

    def cmul(which, x):
        sp = getattr(spec, which)
        if sp[0] == "s":
            return fp.smulT(sp[1], x)
        return fp.cmulT(carr[which], x, N0T, P0T)

    add = fp.addT

    def sub4(a, b):
        return fp.subT(a, b, off4)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = sub4(sub4(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = add(mul(X2, Z1), X1)
    t5 = add(mul(Y2, Z1), Y1)
    Zp = add(cmul("a", t4), cmul("b3", Z1))
    X3 = fp.settleT(t1 - Zp + carr["offX3"], rounds=2)
    Z3 = add(t1, Zp)
    Y3 = mul(X3, Z3)
    t1n = add(add(add(t0, t0), t0), cmul("a", Z1))
    t2n = fp.settleT(cmul("a", t0) - cmul("a2", Z1) + carr["offT2n"],
                     rounds=2)
    t4n = add(cmul("b3", t4), t2n)
    Y3 = add(Y3, mul(t1n, t4n))
    X3o = sub4(mul(t3, X3), mul(t5, t4n))
    Z3o = add(mul(t5, Z3), mul(t3, t1n))
    act = act_row > 0
    if fp.kp > fp.k:
        # infinity flag: table builders mark points at infinity with a 1
        # in X2's pad limb (ops/msm_stream._doubled_u8), which lets the
        # device-scheduled pipeline place them like any point and have
        # the kernel skip the add — no per-table digit masking needed.
        # The flag limb feeds the muls above, but only for rows whose
        # result is discarded right here, and a 1-limb keeps every
        # f32-exactness bound.
        act = act & (X2[fp.kp - 1 : fp.kp, :] < 0.5)
    return (jnp.where(act, X3o, X1), jnp.where(act, Y3, Y1),
            jnp.where(act, Z3o, Z1))


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
        self.madd_spec = _MaddSpec(fp, int(curve.a.n), int(b3.n),
                                   int(a2.n))

    # -- conversions ------------------------------------------------------
    def encode_from_limbs(self, xs, ys, inf):
        """Canonical u64 limb coordinate arrays (the native tier's
        EncodedPoints layout: (n, NL) per coordinate, little-endian) ->
        device-resident f32 Montgomery (X, Y, Z) arrays.  The byte view
        of a u64 limb vector IS the 8-bit f32 limb vector, so the host
        cost is two array casts; the Montgomery encode (one constant
        multiply by R^2) runs on device."""
        import jax

        fp = self.fp
        n = xs.shape[0]

        def to_f32(a):
            a = np.ascontiguousarray(a).view(np.uint8).reshape(n, -1)
            a = a[:, : fp.kp].astype(np.float32)
            if a.shape[1] < fp.kp:
                a = np.pad(a, [(0, 0), (0, fp.kp - a.shape[1])])
            return jnp.asarray(a)

        r2 = np.zeros(fp.kp, dtype=np.float32)
        r2[: fp.k] = ints_to_f32_limbs_np(
            [pow(2, 2 * 8 * fp.k, fp.p)], fp.k)[0]
        one = np.zeros(fp.kp, dtype=np.float32)
        one[: fp.k] = fp.one_mont

        @jax.jit
        def mont_encode(Xc, Yc, fin):
            # chunked via lax.map: the Montgomery-mul intermediates are
            # ~9x the input, which at 2^20-row tables would transiently
            # eat several GB of HBM
            def enc(args):
                Xc_, Yc_, fin_ = args
                c = jnp.broadcast_to(jnp.asarray(r2), Xc_.shape)
                X = fp.mul(Xc_, c)
                Y = fp.mul(Yc_, c)
                onev = jnp.broadcast_to(jnp.asarray(one), Xc_.shape)
                zero = jnp.zeros_like(X)
                m = fin_[:, None]
                return (jnp.where(m, zero, X), jnp.where(m, onev, Y),
                        jnp.where(m, zero, onev))

            rows = Xc.shape[0]
            ck = 65536
            if rows <= ck:
                return enc((Xc, Yc, fin))
            pad = (-rows) % ck
            if pad:
                Xc = jnp.pad(Xc, [(0, pad), (0, 0)])
                Yc = jnp.pad(Yc, [(0, pad), (0, 0)])
                fin = jnp.pad(fin, [(0, pad)])
            sh = ((rows + pad) // ck, ck)
            out = jax.lax.map(
                enc, (Xc.reshape(sh + Xc.shape[1:]),
                      Yc.reshape(sh + Yc.shape[1:]),
                      fin.reshape(sh)))
            return tuple(o.reshape((rows + pad,) + o.shape[2:])[:rows]
                         for o in out)

        return mont_encode(to_f32(xs), to_f32(ys),
                           jnp.asarray(np.asarray(inf, dtype=bool)))

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

    # -- transposed-layout complete add (stream-MSM suffix phase) ---------
    ADD_COLS_BLOCK = 512

    def identity_cols(self, width: int):
        fp = self.fp
        one = np.zeros((fp.kp, 1), dtype=np.float32)
        one[: fp.k, 0] = fp.one_mont
        return (jnp.zeros((fp.kp, width), dtype=jnp.float32),
                jnp.broadcast_to(jnp.asarray(one), (fp.kp, width)),
                jnp.zeros((fp.kp, width), dtype=jnp.float32))

    def add_cols(self, P, Q):
        """Complete RCB add on TRANSPOSED (KP, R) coordinate slabs (limbs
        on sublanes): no per-block Mosaic relayouts, unlike `add`."""
        kp, R = P[0].shape
        fp = self.fp
        if jax.default_backend() != "tpu":
            fld = (jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16),
                   jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16),
                   jnp.asarray(fp.off4p().reshape(-1, 1)))
            consts = tuple(jnp.asarray(c.reshape(-1, 1)) for c in
                           (self.a_enc, self.b3_enc, self.a2_enc))
            return _rcb_addT(fp, consts, fld, P, Q)
        from jax.experimental import pallas as pl

        B = self.ADD_COLS_BLOCK
        m = -(-R // B) * B
        if m != R:
            P = tuple(jnp.pad(c, [(0, 0), (0, m - R)]) for c in P)
            Q = tuple(jnp.pad(c, [(0, 0), (0, m - R)]) for c in Q)
        N0T = jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16)
        P0T = jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16)

        def full(v):
            return jnp.asarray(
                np.broadcast_to(np.asarray(v, dtype=np.float32
                                           ).reshape(-1, 1), (kp, B)).copy())

        off = full(fp.off4p())
        ac, b3c, a2c = (full(self.a_enc), full(self.b3_enc),
                        full(self.a2_enc))

        def kernel(x1, y1, z1, x2, y2, z2, n0, p0, offr, a_r, b3_r, a2_r,
                   ox, oy, oz):
            fld = (n0[:], p0[:], offr[:])
            consts = (a_r[:], b3_r[:], a2_r[:])
            R_ = _rcb_addT(fp, consts, fld,
                           (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
            ox[:], oy[:], oz[:] = R_

        spec = pl.BlockSpec((kp, B), lambda i: (0, i))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((kp, m), jnp.float32)] * 3
        fn = pl.pallas_call(
            kernel,
            grid=(m // B,),
            in_specs=[spec] * 6 + [whole(N0T), whole(P0T), whole(off),
                                   whole(ac), whole(b3c), whole(a2c)],
            out_specs=[spec] * 3,
            out_shape=out_shape,
        )
        out = tuple(fn(*P, *Q, N0T, P0T, off, ac, b3c, a2c))
        if m != R:
            out = tuple(c[:, :R] for c in out)
        return out

    @property
    def kw(self) -> int:
        return self.fp.kp

    def neg_y_slab(self, Y):
        """(n, KP) slab of table Y coords -> 4p - Y (settled)."""
        fp = self.fp
        return fp.settle(jnp.asarray(fp.off4p()) - Y, rounds=2)

    # -- mixed addition (stream-MSM hot loop) ------------------------------
    MADD_BLOCK = 1024   # swept on v5e: 0.314 Mpts/s vs 0.285 at 256

    def madd(self, P, Q, sign, active):
        """acc (X,Y,Z) (n,KP) += affine table points (X2,Y2) (n,KP), with
        per-row sign (negate Q) and active (keep old acc) f32 flags.
        Complete for acc = identity and acc = Q (doubling); Q must be a
        FINITE point (the stream scheduler never gathers infinities).
        Fused Pallas kernel on TPU; plain XLA elsewhere (tests)."""
        n = P[0].shape[0]
        sign = sign.reshape(n, 1).astype(jnp.float32)
        active = active.reshape(n, 1).astype(jnp.float32)
        if jax.default_backend() == "tpu":
            B = self.MADD_BLOCK
            m = -(-n // B) * B
            if m != n:
                P = tuple(jnp.pad(c, [(0, m - n), (0, 0)]) for c in P)
                Q = tuple(jnp.pad(c, [(0, m - n), (0, 0)]) for c in Q)
                sign = jnp.pad(sign, [(0, m - n), (0, 0)])
                active = jnp.pad(active, [(0, m - n), (0, 0)])
            out = self._madd_pallas_T(P, Q, sign, active)
            if m != n:
                out = tuple(c[:n] for c in out)
            return out
        fp = self.fp
        fld = (jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16),
               jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16),
               jnp.asarray(fp.off4p().reshape(-1, 1)))
        carr = self._madd_carr(rows=1)
        R = _rcb_maddT(fp, self.madd_spec, carr, fld,
                       tuple(c.T for c in P), tuple(c.T for c in Q),
                       sign.T, active.T)
        return tuple(c.T for c in R)

    def _madd_carr(self, rows: int):
        """Offset rows + Toeplitz matrices for _rcb_maddT; rows=1 for the
        plain path, BLOCK for the Pallas path (pre-broadcast)."""
        fp = self.fp
        spec = self.madd_spec

        def row(arr):
            a = np.asarray(arr, dtype=np.float32).reshape(-1, 1)
            if rows > 1:
                a = np.broadcast_to(a, (a.shape[0], rows)).copy()
            return jnp.asarray(a)

        carr = {"offX3": row(fp.off_mult_p(spec.offX3)),
                "offT2n": row(fp.off_mult_p(spec.offT2n))}
        for nm in ("a", "b3", "a2"):
            sp = getattr(spec, nm)
            if sp[0] == "m":
                carr[nm] = jnp.asarray(sp[2], dtype=jnp.bfloat16)
        return carr

    def _madd_pallas_T(self, P, Q, sign, active):
        from jax.experimental import pallas as pl

        fp = self.fp
        n, kp = P[0].shape
        B = self.MADD_BLOCK
        N0T = jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16)
        P0T = jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16)

        def full(v):
            return jnp.asarray(
                np.broadcast_to(np.asarray(v, dtype=np.float32
                                           ).reshape(-1, 1), (kp, B)).copy())

        off4 = full(fp.off4p())
        carr_full = self._madd_carr(rows=B)
        mat_names = [nm for nm in ("a", "b3", "a2")
                     if getattr(self.madd_spec, nm)[0] == "m"]
        extra = ([carr_full["offX3"], carr_full["offT2n"]]
                 + [carr_full[nm] for nm in mat_names])

        def kernel(x1, y1, z1, x2, y2, sg, av, n0, p0, offr, *rest):
            offx3, offt2n = rest[0], rest[1]
            mats = rest[2 : 2 + len(mat_names)]
            ox, oy, oz = rest[2 + len(mat_names):]
            carr = {"offX3": offx3[:], "offT2n": offt2n[:]}
            for nm, mref in zip(mat_names, mats):
                carr[nm] = mref[:]
            fld = (n0[:], p0[:], offr[:])
            R = _rcb_maddT(fp, self.madd_spec, carr, fld,
                           tuple(v[:].T for v in (x1, y1, z1)),
                           tuple(v[:].T for v in (x2, y2)),
                           sg[:].T, av[:].T)
            ox[:], oy[:], oz[:] = (r.T for r in R)

        spec = pl.BlockSpec((B, kp), lambda i: (i, 0))
        flag = pl.BlockSpec((B, 1), lambda i: (i, 0))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((n, kp), jnp.float32)] * 3
        fn = pl.pallas_call(
            kernel,
            grid=(n // B,),
            in_specs=[spec] * 5 + [flag, flag]
            + [whole(N0T), whole(P0T), whole(off4)]
            + [whole(c) for c in extra],
            out_specs=[spec] * 3,
            out_shape=out_shape,
            input_output_aliases={0: 0, 1: 1, 2: 2},
        )
        return tuple(fn(*P, *Q, sign, active, N0T, P0T, off4, *extra))

    def madd_accumulate(self, G, loads, init=None):
        """The stream-MSM hot loop as ONE Pallas call: G (T, 2*KP, L) is
        the gathered (X||Y) affine tile stream in the TRANSPOSED layout
        (limbs on sublanes — one XLA transpose after the gather replaces
        two Mosaic relayouts per grid step), loads (1, L) int32 = active
        rounds per lane.  Returns the (L,)-lane accumulators as three
        (KP, L) transposed coordinate slabs after T sequential mixed
        adds per lane.  Grid is (L/BL, T) with T innermost — the
        accumulator lives in VMEM scratch across all T rounds, so HBM
        sees each gathered tile once and the outputs once.

        init: optional prior (KP, L) accumulator triple — the caller may
        CHUNK long round sequences (bounding the gathered-tile transient)
        and thread the accumulator through."""
        T, W2, L = G.shape
        kp = self.fp.kp
        assert W2 == 2 * kp
        if init is None:
            init = tuple(c.T for c in self.identity((L,)))
        if jax.default_backend() != "tpu":
            active = (jax.lax.broadcasted_iota(jnp.int32, (T, L), 0)
                      < loads.reshape(1, L)).astype(jnp.float32)

            def step(acc, xs):
                g, av = xs
                return self.madd(acc, (g[:kp].T, g[kp:].T),
                                 jnp.zeros((L,), jnp.float32), av), None

            acc, _ = jax.lax.scan(step, tuple(c.T for c in init),
                                  (G, active))
            return tuple(c.T for c in acc)
        from jax.experimental import pallas as pl

        fp = self.fp
        B = self.MADD_BLOCK
        assert L % B == 0
        N0T = jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16)
        P0T = jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16)

        def full(v):
            return jnp.asarray(
                np.broadcast_to(np.asarray(v, dtype=np.float32
                                           ).reshape(-1, 1), (kp, B)).copy())

        off4 = full(fp.off4p())
        carr_full = self._madd_carr(rows=B)
        mat_names = [nm for nm in ("a", "b3", "a2")
                     if getattr(self.madd_spec, nm)[0] == "m"]
        extra = ([carr_full["offX3"], carr_full["offT2n"]]
                 + [carr_full[nm] for nm in mat_names])
        spec = self.madd_spec
        nT = T

        def kernel(g, ld, ix, iy, iz, n0, p0, offr, *rest):
            offx3, offt2n = rest[0], rest[1]
            mats = rest[2: 2 + len(mat_names)]
            ox, oy, oz = rest[2 + len(mat_names): 5 + len(mat_names)]
            ax, ay, az = rest[5 + len(mat_names):]
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                ax[:], ay[:], az[:] = ix[:], iy[:], iz[:]

            carr = {"offX3": offx3[:], "offT2n": offt2n[:]}
            for nm, mref in zip(mat_names, mats):
                carr[nm] = mref[:]
            fld = (n0[:], p0[:], offr[:])
            gt = g[0]                       # (2*kp, B) — already transposed
            Q = (gt[:kp], gt[kp:])
            P = (ax[:], ay[:], az[:])
            act = (t < ld[:]).astype(jnp.float32)     # (1, B)
            R = _rcb_maddT_ns(fp, spec, carr, fld, P, Q, act)
            ax[:], ay[:], az[:] = R

            @pl.when(t == nT - 1)
            def _():
                ox[:], oy[:], oz[:] = R

        gspec = pl.BlockSpec((1, 2 * kp, B), lambda l, t: (t, 0, l))
        lspec = pl.BlockSpec((1, B), lambda l, t: (0, l))
        ospec = pl.BlockSpec((kp, B), lambda l, t: (0, l))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda l, t: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((kp, L), jnp.float32)] * 3
        from jax.experimental.pallas import tpu as pltpu

        fn = pl.pallas_call(
            kernel,
            grid=(L // B, T),
            in_specs=[gspec, lspec] + [ospec] * 3
            + [whole(N0T), whole(P0T), whole(off4)]
            + [whole(c) for c in extra],
            out_specs=[ospec] * 3,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((kp, B), jnp.float32)] * 3,
        )
        return tuple(fn(G, loads.astype(jnp.int32).reshape(1, L), *init,
                        N0T, P0T, off4, *extra))

    def double(self, P):
        return self.add(P, P)

    def neg(self, P):
        X, Y, Z = P
        return X, self.fp.neg(Y), Z

    def select(self, cond, P, Q):
        f = self.fp.select
        return (f(cond, P[0], Q[0]), f(cond, P[1], Q[1]),
                f(cond, P[2], Q[2]))


class _ExtOpsT:
    """Binomial-extension field ops in the transposed kernel layout:
    an element is a stack of D prime components, each (K, B) — carved
    out of one (D*KP, B) slab.  NR must lie in the prime subfield (true
    for the MNT towers: u^2 = 17, u^3 = 5).

    Multiplication combines Karatsuba at the WIDE-product level: the
    cross-products are added/subtracted (with a wide 512*p^2 offset so
    wide values stay nonnegative) BEFORE one Montgomery reduction per
    output component — outputs stay tightly in the lazy class (~2p), so
    the small-NR scaling never inflates downstream values."""

    def __init__(self, fp: Fp32Ctx, degree: int, nr: int, fld):
        self.fp = fp
        self.d = degree
        self.nr = float(nr)          # small int (17 / 5): exact in f32
        self.N0T, self.P0T, self.off, self.wideW = fld

    def mul(self, a, b):
        fp = self.fp
        raw = fp.mulT_raw     # 1-round-settled wides: |limbs| <= ~10k,
        # so Karatsuba combos and the nr scale stay f32-exact and redcT's
        # split reduction takes them directly (no 3-round settles)
        red = lambda t: fp.redcT(t, self.N0T, self.P0T)
        W = self.wideW
        nr = self.nr
        if self.d == 2:
            a0, a1 = a
            b0, b1 = b
            t00 = raw(a0, b0)
            t11 = raw(a1, b1)
            tmid = raw(fp.addT(a0, a1), fp.addT(b0, b1))
            c0 = red(t00 + nr * t11)
            c1 = red(tmid - t00 - t11 + W)
            return (c0, c1)
        if self.d == 3:
            a0, a1, a2 = a
            b0, b1, b2 = b
            t00, t11, t22 = raw(a0, b0), raw(a1, b1), raw(a2, b2)
            t01 = raw(fp.addT(a0, a1), fp.addT(b0, b1))
            t02 = raw(fp.addT(a0, a2), fp.addT(b0, b2))
            t12 = raw(fp.addT(a1, a2), fp.addT(b1, b2))
            c0 = red(t00 + nr * (t12 - t11 - t22 + W))
            c1 = red(t01 - t00 - t11 + nr * t22 + W)
            c2 = red(t02 - t00 - t22 + t11 + W)
            return (c0, c1, c2)
        raise NotImplementedError(self.d)

    def add(self, a, b):
        return tuple(self.fp.addT(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.fp.subT(x, y, self.off) for x, y in zip(a, b))

    def cmul(self, CTs, x):
        """Multiply by an extension-field CONSTANT given as d Toeplitz
        matrices (k2p, kp) bf16 of its Montgomery components.  All d*d
        component wides ride the MXU; combined per output component
        (positively — no wide offsets needed) and reduced once each."""
        fp = self.fp
        d, nr = self.d, self.nr
        xs = [fp.settleT(c, rounds=2).astype(jnp.bfloat16) for c in x]
        # one carry round BEFORE the nr scale: raw matmul limb sums reach
        # ~2^21 and nr*2^21 would exceed f32's exact-integer range; after
        # one round limbs are <= ~10k and the scaled combos stay exact
        wide = [[fp.settleT(
                    jnp.dot(CTs[i], xs[j],
                            preferred_element_type=jnp.float32), rounds=1)
                 for j in range(d)] for i in range(d)]
        out = []
        for m in range(d):
            acc = None
            for i in range(d):
                for j in range(d):
                    if (i + j) % d != m:
                        continue
                    t = wide[i][j] if i + j < d else nr * wide[i][j]
                    acc = t if acc is None else acc + t
            out.append(fp.redcT(acc, self.N0T, self.P0T))
        return tuple(out)


class EC32ExtCtx:
    """G2 curves (Fp2/Fp3 coordinates) on the f32 path: a coordinate is a
    (n, D*KP) f32 slab (component c in lanes [c*KP, (c+1)*KP)), so the
    generic MSM gather/scatter/select code is unchanged."""

    BLOCK = 128

    def __init__(self, curve):
        self.curve = curve
        F = curve.F
        self.d = F.extension_degree_over_prime()
        assert self.d in (2, 3)
        prime = F.prime_subfield()
        self.fp = fp32_ctx(prime.MODULUS)
        nr = F.NR
        self.nr_int = nr.n if hasattr(nr, "n") else nr.to_prime_coeffs()[0].n

        def enc_const(e):
            # (d, kp) rows of the Montgomery-encoded prime components
            out = np.zeros((self.d, self.fp.kp), dtype=np.float32)
            cs = e.to_prime_coeffs() if hasattr(e, "to_prime_coeffs") else [e]
            for i, c in enumerate(cs):
                out[i, : self.fp.k] = ints_to_f32_limbs_np(
                    [c.n * self.fp.R % self.fp.p], self.fp.k)[0]
            return out

        self.a_enc = enc_const(curve.a)
        b3 = curve.b + curve.b + curve.b
        self.b3_enc = enc_const(b3)
        self.a2_enc = enc_const(curve.a * curve.a)

    # -- conversions ------------------------------------------------------
    def _enc_elem(self, e):
        fp = self.fp
        out = np.zeros(self.d * fp.kp, dtype=np.float32)
        cs = e.to_prime_coeffs() if hasattr(e, "to_prime_coeffs") else [e]
        for i, c in enumerate(cs):
            out[i * fp.kp : i * fp.kp + fp.k] = ints_to_f32_limbs_np(
                [c.n * fp.R % fp.p], fp.k)[0]
        return out

    def encode_points(self, pts):
        fp = self.fp
        n = len(pts)
        W = self.d * fp.kp
        X = np.zeros((n, W), dtype=np.float32)
        Y = np.zeros((n, W), dtype=np.float32)
        Z = np.zeros((n, W), dtype=np.float32)
        one = np.zeros(W, dtype=np.float32)
        one[: fp.k] = fp.one_mont
        for i, pt in enumerate(pts):
            if pt.is_infinity():
                Y[i] = one
            else:
                X[i] = self._enc_elem(pt.x)
                Y[i] = self._enc_elem(pt.y)
                Z[i] = one
        return X, Y, Z

    def decode_point(self, P):
        fp = self.fp
        F = self.curve.F
        prime = F.prime_subfield()

        def dec(arr):
            arr = np.asarray(arr).reshape(self.d, -1)
            return F.from_prime_coeffs(
                [prime(fp.decode(arr[i : i + 1])[0])
                 for i in range(self.d)])

        x, y, z = (dec(c) for c in P)
        if z.is_zero():
            return self.curve.infinity()
        zi = z.inv()
        return self.curve.point(x * zi, y * zi)

    def identity(self, shape=()):
        fp = self.fp
        W = self.d * fp.kp
        one = np.zeros(W, dtype=np.float32)
        one[: fp.k] = fp.one_mont
        return (jnp.zeros(shape + (W,), dtype=jnp.float32),
                jnp.broadcast_to(jnp.asarray(one), shape + (W,)),
                jnp.zeros(shape + (W,), dtype=jnp.float32))

    # -- addition ---------------------------------------------------------
    def add(self, P, Q):
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
        return self._add_plain(P, Q)

    def _split(self, v):
        """(..., D*KP) -> tuple of D prime components (..., KP)."""
        kp = self.fp.kp
        return tuple(v[..., i * kp : (i + 1) * kp] for i in range(self.d))

    def _join(self, comps):
        return jnp.concatenate(comps, axis=-1)

    def _splitT(self, v):
        """(D*KP, B) -> D x (KP, B) rows."""
        kp = self.fp.kp
        return tuple(v[i * kp : (i + 1) * kp, :] for i in range(self.d))

    def _add_plain(self, P, Q):
        """CPU fallback: transposed math on the last axis via swaps."""
        fp = self.fp
        fld = (jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16),
               jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16),
               jnp.asarray(fp.off4p().reshape(-1, 1)),
               jnp.asarray(fp.wide_p_offset().reshape(-1, 1)))
        ops = _ExtOpsT(fp, self.d, self.nr_int, fld)
        consts = tuple(
            tuple(jnp.asarray(arr[i].reshape(-1, 1)) for i in range(self.d))
            for arr in (self.a_enc, self.b3_enc, self.a2_enc))
        Pt = tuple(tuple(c.T for c in self._split(v)) for v in P)
        Qt = tuple(tuple(c.T for c in self._split(v)) for v in Q)
        R = _rcb_add_ext(ops, consts, Pt, Qt)
        return tuple(self._join(tuple(c.T for c in comp)) for comp in R)

    def _add_pallas_T(self, P, Q):
        from jax.experimental import pallas as pl

        fp = self.fp
        n, W = P[0].shape
        B = self.BLOCK
        d = self.d
        N0T = jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16)
        P0T = jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16)

        def full(row):
            return jnp.asarray(
                np.broadcast_to(np.asarray(row, dtype=np.float32
                                           ).reshape(-1, 1),
                                (fp.kp, B)).copy())

        off = full(fp.off4p())
        wideW = jnp.asarray(
            np.broadcast_to(np.asarray(fp.wide_p_offset(),
                                       dtype=np.float32).reshape(-1, 1),
                            (fp.k2p, B)).copy())
        cst = [full(arr[i]) for arr in (self.a_enc, self.b3_enc,
                                        self.a2_enc) for i in range(d)]

        def kernel(x1, y1, z1, x2, y2, z2, n0, p0, offr, wrow, *rest):
            cs = rest[: 3 * d]
            ox, oy, oz = rest[3 * d :]
            ops = _ExtOpsT(fp, d, self.nr_int,
                           (n0[:], p0[:], offr[:], wrow[:]))
            consts = (tuple(c[:] for c in cs[0:d]),
                      tuple(c[:] for c in cs[d : 2 * d]),
                      tuple(c[:] for c in cs[2 * d : 3 * d]))
            Pt = tuple(self._splitT(v[:].T) for v in (x1, y1, z1))
            Qt = tuple(self._splitT(v[:].T) for v in (x2, y2, z2))
            R = _rcb_add_ext(ops, consts, Pt, Qt)
            for ref, comp in zip((ox, oy, oz), R):
                ref[:] = jnp.concatenate(comp, axis=0).T

        spec = pl.BlockSpec((B, W), lambda i: (i, 0))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((n, W), jnp.float32)] * 3
        fn = pl.pallas_call(
            kernel,
            grid=(n // B,),
            in_specs=[spec] * 6 + [whole(N0T), whole(P0T), whole(off),
                                   whole(wideW)]
            + [whole(c) for c in cst],
            out_specs=[spec] * 3,
            out_shape=out_shape,
        )
        return tuple(fn(*P, *Q, N0T, P0T, off, wideW, *cst))

    def double(self, P):
        return self.add(P, P)

    def neg(self, P):
        X, Y, Z = P
        fp = self.fp
        off = jnp.asarray(fp.off4p())
        comps = self._split(Y)
        negged = tuple(fp.settle(off - c, rounds=2) for c in comps)
        return X, self._join(negged), Z

    def select(self, cond, P, Q):
        f = self.fp.select
        return (f(cond, P[0], Q[0]), f(cond, P[1], Q[1]),
                f(cond, P[2], Q[2]))

    # -- stream-MSM kernels (mirror EC32Ctx; coordinates are (R, D*KP)
    # slabs row-major / (D*KP, R) transposed) ------------------------------
    # 128: the Fp3 complete-add live set at B=256 overflowed the 16 MB
    # scoped-vmem stack (17.93 MB) inside the fused two-phase finish at
    # nwin*L width (help-circuit G2 MSM, caught by bench --tier ivc)
    ADD_COLS_BLOCK = 128
    MADD_BLOCK = 256

    def neg_y_slab(self, Y):
        """(n, D*KP) slab -> 4p - Y per prime component (settled;
        carries must NOT cross component boundaries)."""
        fp = self.fp
        n = Y.shape[0]
        comps = Y.reshape(n, self.d, fp.kp)
        out = fp.settle(jnp.asarray(fp.off4p()) - comps, rounds=2)
        return out.reshape(n, self.d * fp.kp)

    def encode_from_limbs(self, xs, ys, inf):
        """Canonical u64 limb coordinate arrays in the native
        EncodedPoints layout ((n, D*NL) per coordinate, little-endian
        per component) -> device-resident f32 Montgomery (X, Y, Z)
        slabs (n, D*KP)."""
        fp = self.fp
        d = self.d
        n = xs.shape[0]

        def to_f32(a):
            a = np.ascontiguousarray(a).view(np.uint8).reshape(n, d, -1)
            a = a[:, :, : fp.kp].astype(np.float32)
            if a.shape[2] < fp.kp:
                a = np.pad(a, [(0, 0), (0, 0), (0, fp.kp - a.shape[2])])
            return jnp.asarray(a.reshape(n, d * fp.kp))

        r2 = np.zeros(fp.kp, dtype=np.float32)
        r2[: fp.k] = ints_to_f32_limbs_np(
            [pow(2, 2 * 8 * fp.k, fp.p)], fp.k)[0]
        one = np.zeros(d * fp.kp, dtype=np.float32)
        one[: fp.k] = fp.one_mont

        @jax.jit
        def mont_encode(Xc, Yc, fin):
            c = jnp.asarray(r2)

            def body(args):
                Xc_, Yc_, fin_ = args
                rows = Xc_.shape[0]

                def enc(v):
                    comps = v.reshape(rows, d, fp.kp)
                    return fp.mul(comps, jnp.broadcast_to(
                        c, comps.shape)).reshape(rows, d * fp.kp)

                X = enc(Xc_)
                Y = enc(Yc_)
                onev = jnp.broadcast_to(jnp.asarray(one), X.shape)
                zero = jnp.zeros_like(X)
                m = fin_[:, None]
                return (jnp.where(m, zero, X), jnp.where(m, onev, Y),
                        jnp.where(m, zero, onev))

            rows = Xc.shape[0]
            ck = 65536
            if rows <= ck:
                return body((Xc, Yc, fin))
            pad = (-rows) % ck
            if pad:
                Xc = jnp.pad(Xc, [(0, pad), (0, 0)])
                Yc = jnp.pad(Yc, [(0, pad), (0, 0)])
                fin = jnp.pad(fin, [(0, pad)])
            sh = ((rows + pad) // ck, ck)
            out = jax.lax.map(
                body, (Xc.reshape(sh + Xc.shape[1:]),
                       Yc.reshape(sh + Yc.shape[1:]),
                       fin.reshape(sh)))
            return tuple(o.reshape((rows + pad,) + o.shape[2:])[:rows]
                         for o in out)

        return mont_encode(to_f32(xs), to_f32(ys),
                           jnp.asarray(np.asarray(inf, dtype=bool)))

    @property
    def kw(self) -> int:
        return self.d * self.fp.kp

    def _madd_consts(self):
        """d-tuples of (K2P, KP) Toeplitz matrices for a, b3, a2."""
        fp = self.fp
        spec = _MaddSpecExt(self.nr_int, self.d)
        carr = {}
        for nm, enc in (("a", self.curve.a),
                        ("b3", self.curve.b + self.curve.b + self.curve.b),
                        ("a2", self.curve.a * self.curve.a)):
            cs = (enc.to_prime_coeffs() if hasattr(enc, "to_prime_coeffs")
                  else [enc])
            carr[nm] = tuple(
                jnp.asarray(fp.const_toeplitz_T(int(c.n) * fp.R % fp.p),
                            dtype=jnp.bfloat16) for c in cs)
        return spec, carr

    def identity_cols(self, width: int):
        fp = self.fp
        one = np.zeros((self.kw, 1), dtype=np.float32)
        one[: fp.k, 0] = fp.one_mont
        return (jnp.zeros((self.kw, width), dtype=jnp.float32),
                jnp.broadcast_to(jnp.asarray(one), (self.kw, width)),
                jnp.zeros((self.kw, width), dtype=jnp.float32))

    def _ext_fld(self, B: int):
        fp = self.fp

        def full(row, rows):
            return jnp.asarray(
                np.broadcast_to(np.asarray(row, dtype=np.float32
                                           ).reshape(-1, 1),
                                (rows, B)).copy())

        N0T = jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16)
        P0T = jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16)
        off = full(fp.off4p(), fp.kp)
        wideW = full(fp.wide_p_offset(), fp.k2p)
        return N0T, P0T, off, wideW

    def add_cols(self, P, Q):
        """Complete ext add on TRANSPOSED (D*KP, R) slabs."""
        fp = self.fp
        kw, R = P[0].shape
        if jax.default_backend() != "tpu":
            fld = (jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16),
                   jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16),
                   jnp.asarray(fp.off4p().reshape(-1, 1)),
                   jnp.asarray(fp.wide_p_offset().reshape(-1, 1)))
            ops = _ExtOpsT(fp, self.d, self.nr_int, fld)
            consts = tuple(
                tuple(jnp.asarray(arr[i].reshape(-1, 1))
                      for i in range(self.d))
                for arr in (self.a_enc, self.b3_enc, self.a2_enc))
            Rt = _rcb_add_ext(ops, consts,
                              tuple(self._splitT(c) for c in P),
                              tuple(self._splitT(c) for c in Q))
            return tuple(jnp.concatenate(c, axis=0) for c in Rt)
        from jax.experimental import pallas as pl

        B = self.ADD_COLS_BLOCK
        m = -(-R // B) * B
        if m != R:
            P = tuple(jnp.pad(c, [(0, 0), (0, m - R)]) for c in P)
            Q = tuple(jnp.pad(c, [(0, 0), (0, m - R)]) for c in Q)
        N0T, P0T, off, wideW = self._ext_fld(B)

        def full(row):
            return jnp.asarray(
                np.broadcast_to(np.asarray(row, dtype=np.float32
                                           ).reshape(-1, 1),
                                (self.fp.kp, B)).copy())

        cst = [full(arr[i]) for arr in (self.a_enc, self.b3_enc,
                                        self.a2_enc)
               for i in range(self.d)]
        d = self.d
        fp_ = fp

        def kernel(x1, y1, z1, x2, y2, z2, n0, p0, offr, wrow, *rest):
            cs = rest[: 3 * d]
            ox, oy, oz = rest[3 * d:]
            ops = _ExtOpsT(fp_, d, self.nr_int,
                           (n0[:], p0[:], offr[:], wrow[:]))
            consts = (tuple(c[:] for c in cs[0:d]),
                      tuple(c[:] for c in cs[d: 2 * d]),
                      tuple(c[:] for c in cs[2 * d: 3 * d]))
            Pt = tuple(self._splitT(v[:]) for v in (x1, y1, z1))
            Qt = tuple(self._splitT(v[:]) for v in (x2, y2, z2))
            Rt = _rcb_add_ext(ops, consts, Pt, Qt)
            for ref, comp in zip((ox, oy, oz), Rt):
                ref[:] = jnp.concatenate(comp, axis=0)

        spec = pl.BlockSpec((kw, B), lambda i: (0, i))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((kw, m), jnp.float32)] * 3
        fn = pl.pallas_call(
            kernel,
            grid=(m // B,),
            in_specs=[spec] * 6 + [whole(N0T), whole(P0T), whole(off),
                                   whole(wideW)] + [whole(c) for c in cst],
            out_specs=[spec] * 3,
            out_shape=out_shape,
        )
        out = tuple(fn(*P, *Q, N0T, P0T, off, wideW, *cst))
        if m != R:
            out = tuple(c[:, :R] for c in out)
        return out

    def madd_accumulate(self, G, loads, init=None):
        """Ext mirror of EC32Ctx.madd_accumulate: G (T, 2*D*KP, L)
        transposed sign-resolved gathered stream, loads (1, L) int32,
        optional prior accumulator triple (chunked rounds); returns
        3 x (D*KP, L) lane accumulators."""
        T, W2, L = G.shape
        kw = self.kw
        kp = self.fp.kp
        assert W2 == 2 * kw
        if init is None:
            init = self.identity_cols(L)
        spec, carr_mats = self._madd_consts()
        if jax.default_backend() != "tpu":
            fp = self.fp
            fld = (jnp.asarray(fp.N0.T.copy(), dtype=jnp.bfloat16),
                   jnp.asarray(fp.P0.T.copy(), dtype=jnp.bfloat16),
                   jnp.asarray(fp.off4p().reshape(-1, 1)),
                   jnp.asarray(fp.wide_p_offset().reshape(-1, 1)))
            carr = dict(carr_mats)
            carr["offX3"] = jnp.asarray(
                fp.off_mult_p(spec.offX3).reshape(-1, 1))
            carr["offT2n"] = jnp.asarray(
                fp.off_mult_p(spec.offT2n).reshape(-1, 1))
            ops = _ExtOpsT(fp, self.d, self.nr_int, fld)
            active = (jax.lax.broadcasted_iota(jnp.int32, (T, L), 0)
                      < loads.reshape(1, L))

            def step(acc, xs):
                g, av = xs
                Pt = tuple(self._splitT(c) for c in acc)
                Qt = (self._splitT(g[:kw]), self._splitT(g[kw:]))
                Rt = _rcb_madd_extT(ops, spec, carr, Pt, Qt,
                                    av.reshape(1, L))
                return tuple(jnp.concatenate(c, axis=0) for c in Rt), None

            acc, _ = jax.lax.scan(step, init, (G, active))
            return acc
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        fp = self.fp
        B = self.MADD_BLOCK
        assert L % B == 0
        N0T, P0T, off4, wideW = self._ext_fld(B)

        def full(row):
            return jnp.asarray(
                np.broadcast_to(np.asarray(row, dtype=np.float32
                                           ).reshape(-1, 1),
                                (kp, B)).copy())

        offx3 = full(fp.off_mult_p(spec.offX3))
        offt2n = full(fp.off_mult_p(spec.offT2n))
        mats = [m for nm in ("a", "b3", "a2") for m in carr_mats[nm]]
        d = self.d
        nT = T
        self_ = self

        def kernel(g, ld, ix, iy, iz, n0, p0, offr, wrow, ox3, ot2,
                   *rest):
            mats_r = rest[: 3 * d]
            ox, oy, oz = rest[3 * d: 3 * d + 3]
            ax, ay, az = rest[3 * d + 3:]
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                ax[:], ay[:], az[:] = ix[:], iy[:], iz[:]

            ops = _ExtOpsT(fp, d, self_.nr_int,
                           (n0[:], p0[:], offr[:], wrow[:]))
            carr = {"offX3": ox3[:], "offT2n": ot2[:],
                    "a": tuple(m[:] for m in mats_r[0:d]),
                    "b3": tuple(m[:] for m in mats_r[d: 2 * d]),
                    "a2": tuple(m[:] for m in mats_r[2 * d: 3 * d])}
            gt = g[0]
            Pt = tuple(self_._splitT(c[:]) for c in (ax, ay, az))
            Qt = (self_._splitT(gt[:kw]), self_._splitT(gt[kw:]))
            act = (t < ld[:]).astype(jnp.float32)
            Rt = _rcb_madd_extT(ops, spec, carr, Pt, Qt, act)
            joined = tuple(jnp.concatenate(c, axis=0) for c in Rt)
            ax[:], ay[:], az[:] = joined

            @pl.when(t == nT - 1)
            def _():
                ox[:], oy[:], oz[:] = joined

        gspec = pl.BlockSpec((1, 2 * kw, B), lambda l, t: (t, 0, l))
        lspec = pl.BlockSpec((1, B), lambda l, t: (0, l))
        ospec = pl.BlockSpec((kw, B), lambda l, t: (0, l))

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda l, t: (0,) * arr.ndim)

        out_shape = [jax.ShapeDtypeStruct((kw, L), jnp.float32)] * 3
        fn = pl.pallas_call(
            kernel,
            grid=(L // B, T),
            in_specs=[gspec, lspec] + [ospec] * 3
            + [whole(N0T), whole(P0T), whole(off4), whole(wideW),
               whole(offx3), whole(offt2n)] + [whole(m) for m in mats],
            out_specs=[ospec] * 3,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((kw, B), jnp.float32)] * 3,
        )
        return tuple(fn(G, loads.astype(jnp.int32).reshape(1, L), *init,
                        N0T, P0T, off4, wideW, offx3, offt2n, *mats))


class _MaddSpecExt:
    """Offsets + lazy-class bound checks for the extension-field mixed
    add.  All constant muls ride the MXU (outputs ~2p/component), so the
    offsets are small; the asserts pin the Karatsuba wide-offset (512p^2
    must cover every subtracted t00+t11) and the Montgomery wide bound
    (combined wides < R*p, R/p >= 2^14 for 298-bit moduli)."""

    def __init__(self, nr: int, d: int):
        ACC = 6.0
        T4 = 2.0 + ACC
        zp = 4.0                                   # cmul(a,t4)+cmul(b3,Z1)
        self.offX3 = _MaddSpec._pick_off(zp)
        x3 = 2.0 + self.offX3
        z3 = 2.0 + zp
        self.offT2n = _MaddSpec._pick_off(2.0)
        t2n = 2.0 + self.offT2n
        t4n = 2.0 + t2n
        t1n = 6.0 + 2.0
        t3 = 2.0 + 8.0
        t5 = 2.0 + ACC
        pairs = [(ACC, 1.0), (ACC + 4.0, 2.0), (x3, z3), (t1n, t4n),
                 (t3, x3), (t5, t4n), (t5, z3), (t3, t1n), (T4, 1.0),
                 (ACC + 2.0, ACC + 2.0)]
        worst = max(c1 * c2 for c1, c2 in pairs)
        for c1, c2 in pairs:
            # Karatsuba cross-term subtraction stays >= 0 under W=512p^2
            assert 2.0 * c1 * c2 <= 512.0, (c1, c2)
        # Montgomery wide bound per output component (see _ExtOpsT.mul)
        if d == 2:
            assert (1 + nr) * worst < 16000 and 4 * worst + 512 < 16000
        else:
            assert worst + nr * (4 * worst + 512) < 16000
            assert (5 + nr) * worst + 512 < 16000


def _rcb_madd_extT(ops: _ExtOpsT, spec: _MaddSpecExt, carr, P, Q,
                   act_row):
    """Complete MIXED addition (Z2=1) over extension coords, transposed
    layout: every coordinate is a tuple of d (K,B) prime components.
    carr: {'a','b3','a2': d-tuples of Toeplitz mats; 'offX3','offT2n':
    (K,B) rows; 'off4': (K,B)}."""
    fp = ops.fp
    X1, Y1, Z1 = P
    X2, Y2 = Q
    mul, add, sub = ops.mul, ops.add, ops.sub

    def cmul(nm, x):
        return ops.cmul(carr[nm], x)

    def sub_off(a, b, off):
        return tuple(fp.settleT(x - y + off, rounds=2)
                     for x, y in zip(a, b))

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = add(mul(X2, Z1), X1)
    t5 = add(mul(Y2, Z1), Y1)
    Zp = add(cmul("a", t4), cmul("b3", Z1))
    X3 = sub_off(t1, Zp, carr["offX3"])
    Z3 = add(t1, Zp)
    Y3 = mul(X3, Z3)
    t1n = add(add(add(t0, t0), t0), cmul("a", Z1))
    t2n = sub_off(cmul("a", t0), cmul("a2", Z1), carr["offT2n"])
    t4n = add(cmul("b3", t4), t2n)
    Y3 = add(Y3, mul(t1n, t4n))
    X3o = sub(mul(t3, X3), mul(t5, t4n))
    Z3o = add(mul(t5, Z3), mul(t3, t1n))
    act = act_row > 0
    if fp.kp > fp.k:
        # infinity flag in component 0's pad limb (see _rcb_maddT_ns)
        act = act & (X2[0][fp.kp - 1 : fp.kp, :] < 0.5)

    def sel(nw, old):
        return tuple(jnp.where(act, a, b) for a, b in zip(nw, old))

    return sel(X3o, X1), sel(Y3, Y1), sel(Z3o, Z1)


def _rcb_add_ext(ops: _ExtOpsT, consts, P, Q):
    """RCB complete add over extension coords (components as tuples)."""
    a_c, b3_c, a2_c = consts
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    mul, add, sub = ops.mul, ops.add, ops.sub

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


@lru_cache(maxsize=None)
def ec32_ctx(curve):
    if curve.F.extension_degree_over_prime() == 1:
        return EC32Ctx(curve)
    return EC32ExtCtx(curve)
