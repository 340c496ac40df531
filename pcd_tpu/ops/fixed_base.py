"""Device windowed fixed-base scalar multiplication: [s_i] G for many
scalars sharing one base (SNARK key generation is dominated by this —
SURVEY.md D4 'fixed-base precomputed tables').

Host precomputes the window table (nwin x 2^c multiples of G, ~10k host
adds, cached per base); the device kernel is nwin gathers + batched
complete adds — ~38 batched EC adds regardless of batch size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ec_tensor import ec_ctx


class FixedBaseDevice:
    def __init__(self, curve, base, scalar_bits: int, c: int = 8):
        self.ec = ec_ctx(curve)
        self.c = c
        self.nwin = (scalar_bits + c - 1) // c
        # host table: table[w][d] = d * 2^(cw) * base
        rows = []
        cur = base
        for _ in range(self.nwin):
            row = [curve.infinity()]
            for _ in range((1 << c) - 1):
                row.append(row[-1] + cur)
            rows.append(row)
            for _ in range(c):
                cur = cur.double()
        # encode: (nwin, 2^c, coord..., K)
        tx, ty, tz = [], [], []
        for row in rows:
            X, Y, Z = self.ec.encode_points(row)
            tx.append(X)
            ty.append(Y)
            tz.append(Z)
        self.tbl = (jnp.asarray(np.stack(tx)), jnp.asarray(np.stack(ty)),
                    jnp.asarray(np.stack(tz)))

    def digits_from_ints(self, scalars) -> np.ndarray:
        n = len(scalars)
        if self.c == 8:
            # bytes ARE the digits: vectorized via the to_bytes fast path
            buf = b"".join(int(s).to_bytes(self.nwin, "little")
                           for s in scalars)
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, self.nwin)
            return np.ascontiguousarray(arr.T).astype(np.uint32)
        out = np.zeros((self.nwin, n), dtype=np.uint32)
        mask = (1 << self.c) - 1
        for j, s in enumerate(scalars):
            s = int(s)
            for w in range(self.nwin):
                out[w, j] = (s >> (w * self.c)) & mask
        return out

    @partial(jax.jit, static_argnums=0)
    def mul_digits(self, digits):
        """digits: (nwin, n) -> (X, Y, Z) arrays (n, coord..., K)."""
        ec = self.ec
        TX, TY, TZ = self.tbl
        n = digits.shape[1]

        def body(w, acc):
            d = digits[w]
            pts = (TX[w][d], TY[w][d], TZ[w][d])
            return ec.add(acc, pts)

        acc = ec.identity((n,))
        return jax.lax.fori_loop(0, self.nwin, body, acc)

    def mul_digits_padded(self, digits):
        n = digits.shape[1]
        m = 1
        while m < n:
            m *= 2
        if m != n:
            digits = jnp.pad(digits, [(0, 0), (0, m - n)])
        out = self.mul_digits(digits)
        return tuple(c[:n] for c in out)

    def mul_many(self, scalars):
        """host ints -> host affine points (batch)."""
        digits = jnp.asarray(self.digits_from_ints(scalars))
        X, Y, Z = self.mul_digits_padded(digits)
        Xn, Yn, Zn = np.asarray(X), np.asarray(Y), np.asarray(Z)
        return [self.ec.decode_point((Xn[i], Yn[i], Zn[i]))
                for i in range(len(scalars))]


_fb_cache = {}


def fixed_base_device(curve, base, scalar_bits: int, c: int = 8):
    key = (id(curve), base.x, base.y if not base.is_infinity() else None,
           scalar_bits, c)
    if key not in _fb_cache:
        _fb_cache[key] = FixedBaseDevice(curve, base, scalar_bits, c)
    return _fb_cache[key]


class DevicePointVec:
    """A vector of curve points resident on device as (X, Y, Z) limb arrays.
    Used for SNARK key query tables so proving MSMs never round-trip
    through host point objects."""

    def __init__(self, curve, arrays):
        self.curve = curve
        self.arrays = arrays  # (X, Y, Z) jnp arrays, leading dim n

    def __len__(self):
        return int(self.arrays[0].shape[0])

    def slice(self, start, stop):
        return DevicePointVec(
            self.curve, tuple(a[start:stop] for a in self.arrays))

    def to_host(self):
        ec = ec_ctx(self.curve)
        X, Y, Z = (np.asarray(a) for a in self.arrays)
        return [ec.decode_point((X[i], Y[i], Z[i])) for i in range(len(self))]

    @staticmethod
    def from_host(curve, pts):
        ec = ec_ctx(curve)
        X, Y, Z = ec.encode_points(pts)
        return DevicePointVec(curve, (jnp.asarray(X), jnp.asarray(Y),
                                      jnp.asarray(Z)))

    def as_f32(self):
        """(X, Y, Z) in the f32/8-bit-limb encoding (ops/fp32.py) — lazily
        converted on device from the u32 Montgomery-2^304 representation
        (relimb 16->8 bit, then one constant multiply by 2^320 mod p to
        land in the f32 path's Montgomery-2^312 form); cached.  Extension
        coordinates (n, d, K16) become lane-slab layout (n, d*KP)."""
        cached = getattr(self, "_f32", None)
        if cached is not None:
            return cached
        from .fp32 import fp32_ctx, ints_to_f32_limbs_np

        F = self.curve.F
        prime = F.prime_subfield()
        deg = F.extension_degree_over_prime()
        fp = fp32_ctx(prime.MODULUS)
        c_raw = ints_to_f32_limbs_np(
            [pow(2, 8 * (fp.k + 1), fp.p)], fp.k)
        c_arr = jnp.asarray(np.pad(c_raw, [(0, 0), (0, fp.kp - fp.k)])[0])

        @jax.jit
        def conv(a_u32):
            shape = a_u32.shape
            k16 = shape[-1]
            flat = a_u32.reshape(-1, k16)
            n = flat.shape[0]
            lo = (flat & 0xFF).astype(jnp.float32)
            hi = (flat >> 8).astype(jnp.float32)
            inter = jnp.stack([lo, hi], axis=-1).reshape(n, 2 * k16)
            pad = fp.kp - 2 * k16
            if pad > 0:
                inter = jnp.pad(inter, [(0, 0), (0, pad)])
            elif pad < 0:
                inter = inter[:, : fp.kp]
            out = fp.mul(inter, jnp.broadcast_to(c_arr, inter.shape))
            if len(shape) == 3:  # (n, d, K16) -> (n, d*KP)
                out = out.reshape(shape[0], shape[1] * fp.kp)
            return out

        self._f32 = tuple(conv(a) for a in self.arrays)
        return self._f32
