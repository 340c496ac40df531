"""Device Pippenger MSM (SURVEY.md D4 — the #1 hot loop of Groth16/GM17
proving; first-class distributed component).

TPU-native formulation (no fast scatter on TPU -> sort-based buckets):
  1. scalars -> c-bit window digits (host precompute, cheap numpy).
  2. per window (lax.scan over the window axis — one compiled body):
       argsort by digit, gather points, segmented inclusive scan with the
       complete EC add as combiner (jax.lax.associative_scan), segment ends
       scattered into buckets, suffix-scan bucket reduction.
  3. Horner combine across windows (c doublings + add per window).

The complete RCB addition makes every combine branch-free — identity,
doubling and inverse cases all flow through the same formula, which is what
lets the whole MSM be one fused XLA program.

Multi-chip: points are sharded over a mesh axis; each chip runs this kernel
on its shard and partial results are combined with a tree of EC adds after
an all_gather (pcd_tpu/parallel/msm.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .ec_tensor import ECTensorCtx, ec_ctx
from .limbs import LIMB_BITS


class MSMTensorCtx:
    # windows processed together (vmapped) per outer step; bounds peak
    # memory at window_chunk copies of the point set
    WINDOW_CHUNK = 8

    # sign marker for signed-digit encoding (bit 31 of the uint32 digit)
    SIGN_BIT = np.uint32(1 << 31)

    def __init__(self, curve, scalar_bits: int, c: int = 8,
                 backend: str = "u32", signed: bool = False):
        assert LIMB_BITS % c == 0, "window must divide limb size"
        if backend == "f32":
            from .ec32 import ec32_ctx

            self.ec = ec32_ctx(curve)
        else:
            self.ec: ECTensorCtx = ec_ctx(curve)
        self.backend = backend
        self.curve = curve
        self.c = c
        self.scalar_bits = scalar_bits
        self.signed = signed
        base = (scalar_bits + c - 1) // c
        # signed recoding keeps |digit| <= 2^(c-1) (half the buckets) at
        # the cost of one carry-out window
        self.nwin = base + 1 if signed else base

    # -- host-side digit extraction -------------------------------------
    def _unsigned_digits(self, scalars, nwin: int) -> np.ndarray:
        n = len(scalars)
        if self.c == 8:
            # bytes ARE the digits: vectorized via the to_bytes fast path.
            # Widen BEFORE transposing: astype on the C-contiguous array
            # is a fast bulk pass, while ascontiguousarray of the strided
            # transpose is an order of magnitude slower at 2^18.
            buf = b"".join(int(s).to_bytes(nwin, "little")
                           for s in scalars)
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, nwin)
            return arr.astype(np.uint32).T.copy()
        if self.c == 16:
            buf = b"".join(int(s).to_bytes(2 * nwin, "little")
                           for s in scalars)
            arr = np.frombuffer(buf, dtype="<u2").reshape(n, nwin)
            return arr.astype(np.uint32).T.copy()
        out = np.zeros((nwin, n), dtype=np.uint32)
        mask = (1 << self.c) - 1
        for j, s in enumerate(scalars):
            s = int(s)
            for w in range(nwin):
                out[w, j] = (s >> (w * self.c)) & mask
        return out

    def _signed_recode(self, raw: np.ndarray) -> np.ndarray:
        """(nwin-1, n) unsigned int64 window digits -> (nwin, n) signed
        uint32 digits (|d| <= 2^(c-1), sign in bit 31, carry window)."""
        base = self.nwin - 1
        half = 1 << (self.c - 1)
        full = 1 << self.c
        n = raw.shape[1]
        out = np.zeros((self.nwin, n), dtype=np.uint32)
        carry = np.zeros(n, dtype=np.int64)
        for w in range(base):
            d = raw[w] + carry
            carry = (d >= half).astype(np.int64)
            d = d - carry * full
            neg = d < 0
            out[w] = np.where(neg, (-d).astype(np.uint32) | self.SIGN_BIT,
                              d.astype(np.uint32))
        out[base] = carry.astype(np.uint32)
        return out

    def digits_from_ints(self, scalars) -> np.ndarray:
        """(nwin, n) uint32 window digits, LSB window first.  In signed
        mode each digit is |d| with the sign in bit 31 and |d| <= 2^(c-1)
        (the kernel negates gathered points instead of doubling the bucket
        count)."""
        if not self.signed:
            return self._unsigned_digits(scalars, self.nwin)
        raw = self._unsigned_digits(scalars, self.nwin - 1).astype(np.int64)
        return self._signed_recode(raw)

    def digits_from_limbs(self, limbs: np.ndarray) -> np.ndarray:
        """(n, NL) u64 canonical limb scalars (the prover's native limb
        form) -> (nwin, n) uint32 digits with NO Python-int round-trip:
        the little-endian limb bytes ARE the unsigned windows."""
        n = limbs.shape[0]
        limbs = np.ascontiguousarray(limbs)
        if self.c == 16:
            arr = limbs.view("<u2").reshape(n, -1)
        elif self.c == 8:
            arr = limbs.view(np.uint8).reshape(n, -1)
        else:
            from ..native import limbs_to_ints

            return self.digits_from_ints(limbs_to_ints(limbs))
        nwin_u = self.nwin - 1 if self.signed else self.nwin
        if arr.shape[1] < nwin_u:
            arr = np.pad(arr, [(0, 0), (0, nwin_u - arr.shape[1])])
        if not self.signed:
            return arr[:, :nwin_u].astype(np.uint32).T.copy()
        raw = arr[:, :nwin_u].astype(np.int64).T.copy()
        return self._signed_recode(raw)

    def window_chunk(self, n: int) -> int:
        """Windows vmapped per scan step (also the alignment unit of the
        stacked window-sum output — parallel/mesh.sharded_msm_windows
        relies on it when sharding the window axis)."""
        if self.backend == "f32" or self.c >= 16 or n > (1 << 16):
            return 1
        if n <= (1 << 14):
            return self.WINDOW_CHUNK
        return 2

    # -- device kernel ----------------------------------------------------
    def _window_sums_impl(self, P, digits):
        """Traced body: per-window bucket sums; returns stacked coords
        (nwin_padded, ...)."""
        ec = self.ec
        n = digits.shape[1]
        # signed mode: |digit| <= 2^(c-1); gathered points carry the sign
        nbuckets = (1 << (self.c - 1)) + 1 if self.signed else 1 << self.c

        def window_body(digits_w):
            if self.signed:
                mag = digits_w & jnp.uint32(0x7FFFFFFF)
                sgn = (digits_w >> 31).astype(jnp.bool_)
                order = jnp.argsort(mag)
                d_sorted = mag[order]
                sgn_s = sgn[order]
                Xs = P[0][order]
                Ys = P[1][order]
                Zs = P[2][order]
                _, Yn, _ = ec.neg((Xs, Ys, Zs))
                sel = ec.select(sgn_s, (Xs, Yn, Zs), (Xs, Ys, Zs))
                Xs, Ys, Zs = sel
            else:
                order = jnp.argsort(digits_w)
                d_sorted = digits_w[order]
                Xs = P[0][order]
                Ys = P[1][order]
                Zs = P[2][order]
            # segment-start flags
            prev = jnp.concatenate(
                [jnp.full((1,), 0xFFFFFFFF, dtype=d_sorted.dtype),
                 d_sorted[:-1]])
            flags = d_sorted != prev

            def comb(a, b):
                fa, Xa, Ya, Za = a
                fb, Xb, Yb, Zb = b
                added = ec.add((Xa, Ya, Za), (Xb, Yb, Zb))
                sel = ec.select(fb, (Xb, Yb, Zb), added)
                return (fa | fb, sel[0], sel[1], sel[2])

            scanned = jax.lax.associative_scan(
                comb, (flags, Xs, Ys, Zs), axis=0)
            _, SX, SY, SZ = scanned
            is_end = jnp.concatenate(
                [flags[1:], jnp.ones((1,), dtype=jnp.bool_)])
            # scatter segment sums into buckets (overflow slot for non-ends)
            idx = jnp.where(is_end, d_sorted, nbuckets)
            BX, BY, BZ = ec.identity((nbuckets + 1,))
            BX = BX.at[idx].set(SX)
            BY = BY.at[idx].set(SY)
            BZ = BZ.at[idx].set(SZ)
            # drop bucket 0 (digit 0) and overflow; reverse for suffix scan
            BX, BY, BZ = (B[1:nbuckets][::-1] for B in (BX, BY, BZ))

            def comb2(a, b):
                return ec.add(a, b)

            RX, RY, RZ = jax.lax.associative_scan(
                comb2, (BX, BY, BZ), axis=0)
            # window sum = sum of all suffix sums
            TX, TY, TZ = jax.lax.associative_scan(
                comb2, (RX, RY, RZ), axis=0)
            return (TX[-1], TY[-1], TZ[-1])

        # windows processed as a lax.scan over vmapped chunks: ONE traced
        # body instance (compile-size), W windows batched per step
        # (amortizes the small per-window ops).  W shrinks with the point
        # count (and with the bucket count at c=16) to bound the working
        # set.
        W = self.window_chunk(n)
        # digits.shape[0] (not self.nwin): callers may pass a window-axis
        # SHARD of the digit matrix (parallel/mesh.sharded_msm_windows)
        nwin_in = digits.shape[0]
        nw_pad = ((nwin_in + W - 1) // W) * W
        dpad = jnp.pad(digits, [(0, nw_pad - nwin_in), (0, 0)])
        dchunks = dpad.reshape(nw_pad // W, W, n)
        vbody = jax.vmap(window_body)

        def chunk_step(carry, dw):
            return carry, vbody(dw)

        _, ws = jax.lax.scan(chunk_step, 0, dchunks)
        return tuple(w.reshape((nw_pad,) + w.shape[2:]) for w in ws)

    @partial(jax.jit, static_argnums=0)
    def _window_sums_jit(self, P, digits):
        return self._window_sums_impl(P, digits)

    @partial(jax.jit, static_argnums=0)
    def msm_digits(self, P, digits):
        """P: (X, Y, Z) arrays (n, K); digits: (nwin, n) uint32.
        Returns a single projective point (K,)-limb coords."""
        wsums = self._window_sums_impl(P, digits)

        # Horner combine from MSB window down
        def horner(i, acc):
            w = self.nwin - 1 - i

            def dbl(_, a):
                return self.ec.double(a)

            acc = jax.lax.fori_loop(0, self.c, dbl, acc)
            wsum = (wsums[0][w], wsums[1][w], wsums[2][w])
            return self.ec.add(acc, wsum)

        acc = self.ec.identity(())
        acc = jax.lax.fori_loop(0, self.nwin, horner, acc)
        return acc

    def msm_to_host(self, P, digits):
        """Full MSM -> host point.  u32: all-device (Horner in-graph);
        f32: device window sums + host Horner (the 300-doubling tail on
        batch-1 data would bloat the unrolled-mul f32 graph)."""
        import numpy as np

        n = digits.shape[1]
        m = 1
        while m < n:
            m *= 2
        if m != n:
            P = tuple(jnp.pad(c, [(0, m - n)] + [(0, 0)] * (c.ndim - 1))
                      for c in P)
            digits = jnp.pad(digits, [(0, 0), (0, m - n)])
        if self.backend == "f32":
            ws = self._window_sums_jit(P, digits)
            return self.horner_from_window_sums(
                tuple(np.asarray(c) for c in ws))
        out = self.msm_digits(P, digits)
        return self.ec.decode_point(tuple(np.asarray(c) for c in out))

    def horner_from_window_sums(self, wsn):
        """Host Horner combine of fetched window sums (nwin, ...) —
        the tail of the f32 MSM, also used by the hybrid prover to
        collect asynchronously-dispatched device window sums."""
        import numpy as np

        acc = self.curve.infinity()
        for w in reversed(range(self.nwin)):
            for _ in range(self.c):
                acc = acc.double()
            acc = acc + self.ec.decode_point(tuple(c[w] for c in wsn))
        return acc

    def msm_digits_padded(self, P, digits):
        """Pad the point count to the next power of two (zero digits for the
        padding, so it lands in the dropped zero bucket) — collapses the
        number of distinct compiled shapes."""
        import jax.numpy as jnp

        n = digits.shape[1]
        m = 1
        while m < n:
            m *= 2
        if m == n:
            return self.msm_digits(P, digits)
        padP = tuple(jnp.pad(c, [(0, m - n)] + [(0, 0)] * (c.ndim - 1))
                     for c in P)
        padd = jnp.pad(digits, [(0, 0), (0, m - n)])
        return self.msm_digits(padP, padd)

    # -- convenience host API --------------------------------------------
    def msm(self, points, scalars):
        """host points + int scalars -> host point."""
        assert len(points) == len(scalars) and points
        X, Y, Z = self.ec.encode_points(points)
        digits = self.digits_from_ints(scalars)
        return self.msm_to_host(
            (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)),
            jnp.asarray(digits))


@lru_cache(maxsize=None)
def msm_ctx(curve, scalar_bits: int, c: int = 8,
            backend: str = "u32", signed: bool = False) -> MSMTensorCtx:
    return MSMTensorCtx(curve, scalar_bits, c, backend, signed)


def msm_ctx_for(curve, scalar_bits: int, n: int) -> MSMTensorCtx:
    """Backend + window size by problem size and platform:
    - f32 fused-Pallas EC adds on TPU for prime-coordinate curves
      (measured: 0.096 Mpoints/s at n=2^18 vs 0.019 on the u32 path);
    - c=16 at n >= 2^16: half the window count, amortized bucket phase;
    - signed digits: |d| <= 2^(c-1) halves the bucket suffix-scan work
      (a negate + select on gathered points is far cheaper than 2^(c-1)
      extra bucket EC adds per window).
    f32/c=16 are TPU-only: the 2^16-bucket scan graph crashes/stalls the
    XLA-CPU compiler, and the f32 fallback path has an unrolled-mul graph."""
    tpu = jax.default_backend() == "tpu"
    # f32 covers prime (G1) and extension (G2 Fp2/Fp3) coordinates
    f32_ok = tpu and curve.F.extension_degree_over_prime() in (1, 2, 3)
    # c=16 only on the f32 path: the u32 extension-coordinate scan at
    # 2^16 buckets is a compile-time hazard for no measured gain
    c = 16 if (f32_ok and n >= (1 << 16)) else 8
    return msm_ctx(curve, scalar_bits, c, "f32" if f32_ok else "u32",
                   signed=True)
