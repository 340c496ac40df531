"""Stream MSM — the TPU-native Pippenger v2 (SURVEY.md D4; VERDICT r3
next-round item 1: "replace the per-window argsort + log-n
associative_scan of full EC adds with a sort-once layout / bucket
accumulation with VMEM-resident state").

Architecture (vs ops/msm_tensor.py, which sorts and scans ON DEVICE):
the integer bookkeeping is host work, the field math is device work.

  host (numpy; O(n) passes + one radix argsort per window):
    1. signed c-bit digits from the canonical u64 limb scalars;
    2. per window: counting sort by digit magnitude, then a PROPORTIONAL
       lane allocation — each nonempty bucket gets ceil(count/T) of the
       L accumulator lanes, so every lane sequentially folds at most T
       points of ONE bucket (load-balanced by construction, zero digits
       and points at infinity excluded entirely);
    3. emit perm (nwin,T,L) gather indices (sign in bit 31), per-lane
       loads, and per-bucket first-lane indices.  T is quantized to a
       multiple of 4 so compiled shapes stay stable across MSM calls.

  device (per-window dispatch so schedule uploads overlap compute):
    4. gather the permuted doubled-table rows once per window (XLA take;
       the sign bit indexes the negated-Y half);
    5. ONE Pallas call per window runs all T mixed-add rounds
       (ec32.*.madd_accumulate, Z2=1) with the L lane accumulators in
       VMEM scratch — HBM sees each gathered tile once;
    6. ONE unmasked suffix doubling-scan over the bucket-sorted lanes:
       the first lane of bucket b then holds Q_b = sum_{b'>=b} S_b', and
       sum_b b*S_b = sum_b Q_b — so a bucket gather + halving tree
       reduce finishes the window with no masked segmented logic at all;
    7. window sums return to the host for the tiny Horner tail.

Work: ~L*T ≈ 1.2n mixed adds per window (vs ~2n FULL adds per window
for the associative-scan design, which also paid a device argsort per
window and materialized every scan level to HBM).

Reference parity: this is the prover MSM of Groth16/GM17/Marlin
(ark-groth16 prove, reference Cargo.toml:39; hot call sites
ec_cycle_pcd/mod.rs:171,179).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .ec32 import ec32_ctx

_SIGN = np.uint32(1 << 31)


class StreamSchedule:
    """Host-computed gather schedule for one scalar vector."""

    __slots__ = ("perm", "loads", "bidx", "T")

    def __init__(self, perm, loads, bidx, T):
        self.perm = perm      # (nwin, T, L) uint32, sign in bit 31
        self.loads = loads    # (nwin, L) int32
        self.bidx = bidx      # (nwin, B) int32 (L = identity slot)
        self.T = T


class StreamMSMCtx:
    """Prime-coordinate (G1) and Fp2/Fp3 (G2) curves; the ext path uses
    the same scheduler and pipeline with D*KP-wide coordinate slabs and
    the Karatsuba ext kernels (ec32.EC32ExtCtx)."""

    def __init__(self, curve, scalar_bits: int, c: int = 12,
                 lanes: int = 8192):
        assert 2 <= c <= 14
        self.curve = curve
        self.ec = ec32_ctx(curve)
        self.c = c
        self.B = 1 << (c - 1)          # bucket magnitudes 1..B
        self.L = lanes
        assert lanes % 128 == 0 and lanes > self.B // 8
        self.scalar_bits = scalar_bits
        self.base_windows = -(-scalar_bits // c)
        # The signed-digit carry out of window base-2 is ABSORBED by the
        # top window whenever its raw digit has headroom (top_bits <=
        # c-1, so mag <= 2^top_bits <= B): one whole window of madd /
        # gather / suffix work disappears, and no window is ever the
        # pathological single-bucket carry column.  Only scalar_bits
        # divisible by c still needs the extra carry window.
        top_bits = scalar_bits - (self.base_windows - 1) * c
        self.carry_win = top_bits >= c
        self.nwin = self.base_windows + (1 if self.carry_win else 0)

    # -- host: digits -----------------------------------------------------
    def digits_signed(self, limbs: np.ndarray):
        """(n, NL) u64 canonical limbs -> (mags (nwin,n) int32 in [0,B],
        signs (nwin,n) bool).  Little-endian byte view; no Python ints."""
        n = limbs.shape[0]
        c, base = self.c, self.base_windows
        by = np.ascontiguousarray(limbs).view(np.uint8).reshape(n, -1)
        need = (base * c + 7) // 8 + 3
        if by.shape[1] < need:
            by = np.pad(by, [(0, 0), (0, need - by.shape[1])])
        mask = (1 << c) - 1
        half = 1 << (c - 1)
        full = 1 << c
        mags = np.zeros((self.nwin, n), dtype=np.int32)
        signs = np.zeros((self.nwin, n), dtype=bool)
        carry = np.zeros(n, dtype=np.int64)
        for w in range(base):
            bit = w * c
            b0, sh = bit >> 3, bit & 7
            v = (by[:, b0].astype(np.uint32)
                 | (by[:, b0 + 1].astype(np.uint32) << 8)
                 | (by[:, b0 + 2].astype(np.uint32) << 16)) >> sh
            d = (v & mask).astype(np.int64) + carry
            if w == base - 1 and not self.carry_win:
                # top window absorbs the carry unsigned (mag <= B by the
                # carry_win headroom condition in __init__)
                if (d > self.B).any():
                    raise ValueError(
                        "scalar exceeds declared scalar_bits")
                mags[w] = d
                return mags, signs
            carry = (d >= half).astype(np.int64)
            d -= carry * full
            neg = d < 0
            mags[w] = np.where(neg, -d, d)
            signs[w] = neg
        mags[base] = carry
        return mags, signs

    @staticmethod
    def limb_rows(scalars, nbytes: int = 40) -> np.ndarray:
        """int list -> (n, nbytes/8) u64 little-endian limb rows."""
        buf = b"".join(int(s).to_bytes(nbytes, "little") for s in scalars)
        return np.frombuffer(buf, dtype="<u8").reshape(len(scalars), -1)

    # -- host: schedule ---------------------------------------------------
    def _fit_T(self, counts_nz: np.ndarray, m: int) -> int:
        T = max(1, -(-m // self.L))
        while True:
            lanes = -(-counts_nz // T)
            if int(lanes.sum()) <= self.L:
                return T
            T += max(1, T // 8)

    def schedule(self, mags: np.ndarray, signs: np.ndarray,
                 inf=None) -> StreamSchedule:
        nwin, n = mags.shape
        L, B = self.L, self.B
        if inf is not None:
            inf = np.asarray(inf, dtype=bool)
            if inf.any():
                mags = np.where(inf[None, :], 0, mags)
        per_win = []
        T = 8
        for w in range(nwin):
            mag = mags[w]
            counts = np.bincount(mag, minlength=B + 1)
            m = n - int(counts[0])
            per_win.append((mag, counts))
            T = max(T, self._fit_T(counts[1:], m))
        T = -(-T // 4) * 4
        perm = np.zeros((nwin, T * L), dtype=np.uint32)
        loads = np.zeros((nwin, L), dtype=np.int32)
        # GLOBAL first-lane index per bucket (w*L + lane) into the
        # batched (nwin*L)-row lane array; nwin*L = the identity pad row
        bidx = np.full((nwin, B), nwin * L, dtype=np.int32)
        for w in range(nwin):
            mag, counts = per_win[w]
            cnz = counts[1:]
            lanes_b = -(-cnz // T)               # ceil; 0 for empty
            starts = np.zeros(B, dtype=np.int64)
            np.cumsum(lanes_b[:-1], out=starts[1:])
            sort_idx = np.argsort(mag, kind="stable")
            nz0 = int(counts[0])
            pidx = sort_idx[nz0:]
            if pidx.shape[0]:
                s_mag = mag[pidx] - 1            # bucket index 0..B-1
                cum_excl = np.zeros(B, dtype=np.int64)
                np.cumsum(cnz[:-1], out=cum_excl[1:])
                k = np.arange(pidx.shape[0], dtype=np.int64) \
                    - cum_excl[s_mag]
                lb = lanes_b[s_mag]
                lane = starts[s_mag] + k % lb
                rnd = k // lb
                val = pidx.astype(np.uint32)
                val |= signs[w][pidx].astype(np.uint32) << 31
                perm[w][rnd * L + lane] = val
                loads[w] = np.bincount(lane, minlength=L)
            # Q_j gather: first lane of the smallest nonempty bucket >= j
            arr = np.where(cnz > 0, w * L + starts,
                           nwin * L).astype(np.int64)
            bidx[w] = np.minimum.accumulate(arr[::-1])[::-1]
        return StreamSchedule(perm.reshape(nwin, T, L), loads, bidx, T)

    # rounds per gather chunk: bounds the gathered-tile transient to
    # ~250 MB regardless of T / coordinate width (GM17's 2^19 G2 windows
    # would otherwise materialize ~1.5 GB per window and OOM the chip)
    CHUNK_BYTES = 250 << 20

    # -- device -----------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _madd_win_dev(self, XY, perm_w, loads_w):
        """One window's lane accumulation: chunked gather + madd-kernel
        rounds with the accumulator threaded through.  Dispatched per
        window (not scanned) so the NEXT window's schedule upload rides
        the wire while this window computes — on the tunneled dev box
        host->device moves at ~50 MB/s and would otherwise serialize
        ~0.5 s ahead of the device work."""
        ec = self.ec
        kw = ec.kw
        T, L = perm_w.shape
        n2 = XY.shape[0] // 2   # doubled table: rows n..2n-1 hold -P
        # sign bit selects the negated-Y half of the doubled table —
        # the whole signed-digit negation costs one integer add here
        idx = ((perm_w & jnp.uint32(0x7FFFFFFF))
               + (perm_w >> 31) * jnp.uint32(n2)).astype(jnp.int32)
        tc = max(4, self.CHUNK_BYTES // (2 * L * 2 * kw * 4))
        acc = None
        for t0 in range(0, T, tc):
            t1 = min(T, t0 + tc)
            G = jnp.take(XY, idx[t0:t1].reshape(-1), axis=0)
            # one XLA transpose to the limbs-on-sublanes kernel layout
            Gt = jnp.transpose(G.reshape(t1 - t0, L, 2 * kw), (0, 2, 1))
            lw = jnp.clip(loads_w - t0, 0, t1 - t0)
            acc = ec.madd_accumulate(Gt, lw, init=acc)
        return acc

    @partial(jax.jit, static_argnums=0)
    def _finish_dev(self, accs, bidx_flat):
        """accs: 3 coords, each (nwin, KP, L); bidx_flat: (nwin*B,)
        GLOBAL first-lane indices (sentinel nwin*L = identity).
        Batched window-local suffix doubling over bucket-sorted lanes,
        then the bucket gather + halving reduce."""
        ec = self.ec
        fp = ec.fp
        L, B = self.L, self.B
        nwin = accs[0].shape[0]
        kw = ec.kw
        R = nwin * L
        U = tuple(jnp.transpose(a, (1, 0, 2)).reshape(kw, R)
                  for a in accs)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape(R) % L
        s = 1
        while s < L:
            idc = ec.identity_cols(s)
            shifted = tuple(
                jnp.concatenate([c[:, s:], i0], axis=1)
                for c, i0 in zip(U, idc))
            added = ec.add_cols(U, shifted)
            ok = (lane + s < L)[None, :]
            U = tuple(jnp.where(ok, a, u) for a, u in zip(added, U))
            s *= 2
        # back to row-major for the bucket gather + halving reduce
        idrow = ec.identity((1,))
        Upad = tuple(jnp.concatenate([c.T, i0], axis=0)
                     for c, i0 in zip(U, idrow))
        Q = tuple(jnp.take(c, bidx_flat, axis=0) for c in Upad)
        w = B
        while w > 1:
            Q = tuple(c.reshape(nwin, w, kw) for c in Q)
            Q = ec.add(
                tuple(c[:, : w // 2].reshape(-1, kw) for c in Q),
                tuple(c[:, w // 2:].reshape(-1, kw) for c in Q))
            w //= 2
        return tuple(c.reshape(nwin, kw) for c in Q)

    # -- host tail ---------------------------------------------------------
    def horner_host(self, wsn) -> object:
        acc = self.curve.infinity()
        for w in reversed(range(self.nwin)):
            for _ in range(self.c):
                acc = acc.double()
            acc = acc + self.ec.decode_point(
                tuple(c[w: w + 1] for c in wsn))
        return acc

    # -- entry points -------------------------------------------------------
    def _doubled(self, X, Y):
        """(2m, 2*KP) combined table with m = pow2-padded row count:
        rows [0,m) = (X||Y), rows [m,2m) = (X||-Y).  A signed digit
        gathers from the second half — the per-point negation costs one
        index add instead of a masked negate pass over the gathered
        stream.  Pow2 padding keeps the gather/madd program shapes
        stable across the prover's different query-table sizes."""
        ec = self.ec
        n = X.shape[0]
        m = 1
        while m < n:
            m *= 2

        @jax.jit
        def build(X, Y):
            if m != n:
                Xp = jnp.pad(X, [(0, m - n), (0, 0)])
                Yp = jnp.pad(Y, [(0, m - n), (0, 0)])
            else:
                Xp, Yp = X, Y
            Yn = ec.neg_y_slab(Yp)
            return jnp.concatenate(
                [jnp.concatenate([Xp, Yp], axis=1),
                 jnp.concatenate([Xp, Yn], axis=1)], axis=0)

        return build(X, Y)

    def encode_table(self, points):
        """Host point list -> (device (2n, 2*KP) doubled X||(+-Y) affine
        table, infinity mask).  Infinite rows are excluded by the
        scheduler, never gathered."""
        X, Y, _ = self.ec.encode_points(points)
        inf = np.array([p.is_infinity() for p in points], dtype=bool)
        return self._doubled(jnp.asarray(X), jnp.asarray(Y)), inf

    def table_from_limbs(self, xs, ys, inf):
        """Canonical u64 limb coordinate arrays (native EncodedPoints
        layout) -> doubled device table; Montgomery encode on device."""
        X, Y, _ = self.ec.encode_from_limbs(xs, ys, inf)
        return self._doubled(X, Y), np.asarray(inf, bool)

    def schedule_any(self, limbs: np.ndarray, inf=None) -> StreamSchedule:
        """Native (threaded C++) schedule when available, numpy fallback
        (identical semantics; the two emit different but equivalent
        placements)."""
        try:
            from ..native import msm_schedule

            out = msm_schedule(limbs, inf, self.c, self.nwin, self.L,
                               self.B, carry_win=self.carry_win)
        except Exception:
            out = None
        if out is not None:
            perm, loads, bidx, T = out
            return StreamSchedule(perm, loads, bidx, T)
        mags, signs = self.digits_signed(limbs)
        return self.schedule(mags, signs, inf)

    # HBM budget for queued gather intermediates: each in-flight window
    # holds its gathered tile stream (+ transpose copy) live until its
    # kernel runs, so unbounded async dispatch OOMs at 2^19 G2 scale
    # queue-wide transient budget before the fetch-based backpressure
    # engages; the device drains windows in enqueue order, so in steady
    # state only a few windows' transients are simultaneously live even
    # when the prover queues four MSMs back-to-back
    INFLIGHT_BYTES = 10 << 30

    def window_sums_async(self, XY, sched: StreamSchedule):
        """Dispatch the full device pipeline; returns the (nwin, KP)
        window-sum device arrays WITHOUT blocking on the final result.
        Per-window schedule slices are device_put + dispatched one at a
        time so the wire transfer of window w+1 overlaps window w's
        compute, with byte-budget backpressure bounding queued gather
        memory (a no-op for small windows)."""
        # with the gather chunking (CHUNK_BYTES) a queued window's live
        # transients are bounded, so the whole per-MSM queue fits HBM
        # comfortably and backpressure is normally OFF.  The sparse
        # completion fetches below are a safety net for future huge
        # shapes only: each costs a ~25-45 ms tunnel round-trip
        # (block_until_ready is unreliable through the tunneled device,
        # so real backpressure needs a real scalar fetch)
        per_win = min(2 * sched.T * self.L * 2 * self.ec.kw * 4,
                      2 * self.CHUNK_BYTES)
        max_inflight = self.nwin + 1
        if per_win * self.nwin > self.INFLIGHT_BYTES:
            max_inflight = max(2, int(self.INFLIGHT_BYTES
                                      // max(per_win, 1)))
        stride = max(1, max_inflight // 2)
        accs = []
        for w in range(self.nwin):
            pw = jax.device_put(sched.perm[w])
            lw = jax.device_put(sched.loads[w])
            accs.append(self._madd_win_dev(XY, pw, lw))
            lag = w - max_inflight
            if lag >= 0 and w % stride == 0:
                float(accs[lag][0][0, 0])
        stacked = tuple(jnp.stack([a[i] for a in accs])
                        for i in range(3))
        return self._finish_dev(stacked,
                                jnp.asarray(sched.bidx.reshape(-1)))

    def msm_limbs(self, XY, limbs: np.ndarray, inf=None):
        """Combined device table + (n, NL) u64 canonical limb scalars ->
        host point."""
        sched = self.schedule_any(limbs, inf)
        ws = self.window_sums_async(XY, sched)
        return self.horner_host(tuple(np.asarray(c) for c in ws))

    def msm(self, points, scalars):
        """Host convenience API: point list + int scalars -> host point."""
        assert len(points) == len(scalars) and points
        XY, inf = self.encode_table(points)
        nbytes = (self.scalar_bits + 63) // 64 * 8
        limbs = self.limb_rows(scalars, nbytes)
        return self.msm_limbs(XY, limbs, inf=inf)


@lru_cache(maxsize=None)
def stream_ctx(curve, scalar_bits: int, c: int = 12,
               lanes: int = 8192) -> StreamMSMCtx:
    return StreamMSMCtx(curve, scalar_bits, c, lanes)


def stream_ok(curve) -> bool:
    """Stream MSM covers prime (G1) and Fp2/Fp3 (G2) coordinates."""
    return curve.F.extension_degree_over_prime() in (1, 2, 3)
