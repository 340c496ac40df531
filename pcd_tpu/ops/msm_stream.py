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
    """Host-computed gather schedule for one scalar vector, in the
    packed wire format (3 bytes/slot: the tunneled host->device wire is
    the 2^18-MSM critical path, so the schedule upload is byte-packed —
    23-bit table index + sign in bit 23, split u16 lo / u8 hi)."""

    __slots__ = ("perm_lo", "perm_hi", "loads", "bidx", "runrem",
                 "maxrun", "T", "_dev")

    IDX_BITS = 23

    def __init__(self, perm, loads, bidx_minacc, T, L):
        # perm: (nwin, T, L) uint32, raw index with sign in bit 31
        nwin = perm.shape[0]
        idx = perm & np.uint32(0x7FFFFFFF)
        if idx.size and int(idx.max()) >> self.IDX_BITS:
            raise ValueError("table index exceeds 23-bit wire format")
        packed = idx | ((perm >> 31) << self.IDX_BITS)
        self.perm_lo = (packed & 0xFFFF).astype(np.uint16)
        self.perm_hi = (packed >> 16).astype(np.uint8)
        self.loads = loads    # (nwin, L) int32
        self.T = T
        # bidx arrives min-accumulated ("first lane of the smallest
        # nonempty bucket >= j", sentinel nwin*L); the two-phase finish
        # wants the DIRECT first lane per bucket + per-lane run lengths
        SENT = nwin * L
        direct = np.full_like(bidx_minacc, SENT)
        runrem = np.zeros((nwin, L), dtype=np.int16)
        maxrun = 1
        for w in range(nwin):
            bw = bidx_minacc[w]
            nxt = np.append(bw[1:], SENT)
            nonempty = bw != nxt
            direct[w] = np.where(nonempty, bw, SENT)
            starts = (bw[nonempty] - w * L).astype(np.int64)
            if not starts.size:
                continue
            used = int(np.count_nonzero(loads[w]))
            ends = np.append(starts[1:], used)
            lane = np.arange(used, dtype=np.int64)
            seg = np.searchsorted(starts, lane, side="right") - 1
            runrem[w, :used] = ends[seg] - lane
            maxrun = max(maxrun, int((ends - starts).max()))
        self.bidx = direct
        self.runrem = runrem
        m = 1
        while m < maxrun:
            m *= 2
        self.maxrun = m       # pow2-quantized (static jit key)

    def perm_unpacked(self) -> np.ndarray:
        """(nwin, T, L) uint32 raw format (sign in bit 31) — tests."""
        packed = (self.perm_lo.astype(np.uint32)
                  | (self.perm_hi.astype(np.uint32) << 16))
        idx = packed & ((1 << self.IDX_BITS) - 1)
        return idx | ((packed >> self.IDX_BITS) << 31)


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
        return StreamSchedule(perm.reshape(nwin, T, L), loads, bidx, T, L)

    # rounds per gather chunk: bounds the gathered-tile transient to
    # ~250 MB regardless of T / coordinate width (GM17's 2^19 G2 windows
    # would otherwise materialize ~1.5 GB per window and OOM the chip)
    CHUNK_BYTES = 250 << 20

    # -- device -----------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _madd_win_dev(self, XY, perm_lo, perm_hi, loads_w):
        """One window's lane accumulation: chunked gather + madd-kernel
        rounds with the accumulator threaded through.  Dispatched per
        window (not scanned) so the NEXT window's schedule upload rides
        the wire while this window computes — on the tunneled dev box
        host->device moves at ~50 MB/s and would otherwise serialize
        ~0.5 s ahead of the device work.  XY is the uint8 canonical-limb
        doubled table (4x less HBM random-read per gathered row than the
        old f32 table); perm is the 3-byte packed wire format."""
        ec = self.ec
        kw = ec.kw
        T, L = perm_lo.shape
        n2 = XY.shape[0] // 2   # doubled table: rows n..2n-1 hold -P
        packed = (perm_lo.astype(jnp.int32)
                  + (perm_hi.astype(jnp.int32) << 16))
        sign = packed >> StreamSchedule.IDX_BITS
        # sign bit selects the negated-Y half of the doubled table —
        # the whole signed-digit negation costs one integer add here
        idx = (packed & ((1 << StreamSchedule.IDX_BITS) - 1)) + sign * n2
        tc = max(4, self.CHUNK_BYTES // (2 * L * 2 * kw * 4))
        acc = None
        for t0 in range(0, T, tc):
            t1 = min(T, t0 + tc)
            G = jnp.take(XY, idx[t0:t1].reshape(-1), axis=0)
            # one XLA transpose to the limbs-on-sublanes kernel layout,
            # fused with the uint8 -> f32 widen
            Gt = jnp.transpose(G.reshape(t1 - t0, L, 2 * kw),
                               (0, 2, 1)).astype(jnp.float32)
            lw = jnp.clip(loads_w - t0, 0, t1 - t0)
            acc = ec.madd_accumulate(Gt, lw, init=acc)
        return acc

    @partial(jax.jit, static_argnums=(0, 4))
    def _finish_dev(self, accs, bidx_flat, runrem_flat, maxrun: int):
        """accs: 3 coords, each (nwin, KP, L); bidx_flat: (nwin*B,)
        DIRECT global first-lane index per bucket (sentinel nwin*L =
        identity row); runrem_flat: (nwin*L,) lanes remaining in the
        lane's bucket segment (0 = unused lane); maxrun: pow2 bound on
        the longest segment (static jit key).

        Two-phase finish (VERDICT r4: suffix phase at 2.77M full adds vs
        the ~1.3M lower bound): (1) an in-segment suffix scan of only
        ceil(log2 maxrun) rounds merges each bucket's lanes (maxrun is
        typically 2-8, vs log2(L)=13 rounds of the old whole-axis scan);
        (2) the per-bucket sums are gathered COMPACTLY (nwin*B columns,
        4-16x narrower than nwin*L) and the weighted sum_b b*S_b runs as
        a suffix scan + halving reduce on that narrow array."""
        ec = self.ec
        L, B = self.L, self.B
        nwin = accs[0].shape[0]
        kw = ec.kw
        R = nwin * L
        U = tuple(jnp.transpose(a, (1, 0, 2)).reshape(kw, R)
                  for a in accs)
        s = 1
        while s < maxrun:
            idc = ec.identity_cols(s)
            shifted = tuple(
                jnp.concatenate([c[:, s:], i0], axis=1)
                for c, i0 in zip(U, idc))
            added = ec.add_cols(U, shifted)
            ok = (runrem_flat > s)[None, :]
            U = tuple(jnp.where(ok, a, u) for a, u in zip(added, U))
            s *= 2
        # compact per-bucket sums: row-major pad + direct-bidx gather
        idrow = ec.identity((1,))
        Upad = tuple(jnp.concatenate([c.T, i0], axis=0)
                     for c, i0 in zip(U, idrow))
        C = nwin * B
        Q = tuple(jnp.take(c, bidx_flat, axis=0).T for c in Upad)
        # suffix over the bucket axis within each window: col j ends with
        # Q_j = sum_{b >= j} S_b, so sum_j Q_j = sum_b b*S_b
        bpos = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0).reshape(C) % B
        s = 1
        while s < B:
            idc = ec.identity_cols(s)
            shifted = tuple(
                jnp.concatenate([c[:, s:], i0], axis=1)
                for c, i0 in zip(Q, idc))
            added = ec.add_cols(Q, shifted)
            ok = (bpos + s < B)[None, :]
            Q = tuple(jnp.where(ok, a, q) for a, q in zip(added, Q))
            s *= 2
        Q = tuple(c.T for c in Q)
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
    def _mont_u8(self, comps: np.ndarray) -> np.ndarray:
        """(M, NL) u64 canonical prime-field coordinates -> (M, KP) u8
        canonical limbs of x*R mod p (Montgomery form).  Host-side via
        the native C++ tier: canonical [0, p) values give strict 8-bit
        limbs, which is what makes the uint8 device table exact (the
        madd kernel widens them to f32 in VMEM)."""
        fp = self.ec.fp
        p = fp.p
        M = comps.shape[0]
        r_mod = fp.R % p
        try:
            from ..native import NL, ints_to_limbs, vec_op

            rrow = np.broadcast_to(ints_to_limbs([r_mod]), (M, NL))
            mont = vec_op(p, "mul", np.ascontiguousarray(comps), rrow)
        except Exception:
            from ..native import NL, ints_to_limbs, limbs_to_ints

            mont = ints_to_limbs([v * r_mod % p
                                  for v in limbs_to_ints(comps)])
        u8 = np.ascontiguousarray(mont).view(np.uint8).reshape(M, -1)
        kp = fp.kp
        if u8.shape[1] >= kp:
            return np.ascontiguousarray(u8[:, :kp])
        return np.pad(u8, [(0, 0), (0, kp - u8.shape[1])])

    def _neg_u8(self, comps_u8: np.ndarray) -> np.ndarray:
        """(M, KP) u8 Montgomery limbs -> limbs of (p - x) mod p."""
        fp = self.ec.fp
        p = fp.p
        M = comps_u8.shape[0]
        try:
            from ..native import NL, vec_op

            full = np.zeros((M, NL * 8), dtype=np.uint8)
            full[:, : comps_u8.shape[1]] = comps_u8
            neg = vec_op(p, "sub", np.zeros((M, NL), dtype="<u8"),
                         full.view("<u8").reshape(M, NL))
        except Exception:
            from ..native import NL, ints_to_limbs, limbs_to_ints

            full = np.zeros((M, NL * 8), dtype=np.uint8)
            full[:, : comps_u8.shape[1]] = comps_u8
            neg = ints_to_limbs(
                [(p - v) % p
                 for v in limbs_to_ints(full.view("<u8").reshape(M, NL))])
        u8 = np.ascontiguousarray(neg).view(np.uint8).reshape(M, -1)
        kp = fp.kp
        return np.ascontiguousarray(u8[:, :kp])

    def _doubled_u8(self, Xu8, Yu8, Ynu8, inf, to_device: bool = True):
        """Build the (2m, 2W) uint8 combined table: rows [0,m) = (X||Y),
        rows [m,2m) = (X||-Y); m = pow2-padded row count (stable gather
        and madd program shapes across the prover's table sizes).  A
        signed digit gathers from the second half, so the per-point
        negation costs one index add.  uint8 canonical limbs: 4x less
        HBM per gathered row AND 4x less one-time table upload than the
        old f32 table.  to_device=False returns host numpy (the sharded
        path stacks per-device shards before one sharded device_put)."""
        n, W = Xu8.shape
        m = 1
        while m < n:
            m *= 2
        out = np.zeros((2 * m, 2 * W), dtype=np.uint8)
        fin = np.asarray(inf, dtype=bool)
        if fin.any():
            keep = ~fin[:, None]
            Xu8 = np.where(keep, Xu8, 0)
            Yu8 = np.where(keep, Yu8, 0)
            Ynu8 = np.where(keep, Ynu8, 0)
            fp = self.ec.fp
            if fp.kp > fp.k:
                # infinity FLAG in component 0's pad limb: the madd
                # kernels skip flagged rows (ec32._rcb_maddT_ns), so the
                # device-scheduled pipeline needs no per-table digit
                # masking and scalar uploads/sorts can be shared across
                # query tables with different infinity sets.
                Xu8 = Xu8.copy()
                Xu8[fin, fp.kp - 1] = 1
        out[:n, :W] = Xu8
        out[:n, W:] = Yu8
        out[m : m + n, :W] = Xu8
        out[m : m + n, W:] = Ynu8
        return jax.device_put(out) if to_device else out

    def _coords_u8(self, xs, ys, n):
        """Per-component Montgomery u8 slabs for (n, D*NL) u64 coords."""
        ec = self.ec
        d = getattr(ec, "d", 1)
        kp = ec.fp.kp
        from ..native import NL

        xs5 = np.ascontiguousarray(xs, dtype="<u8").reshape(n * d, NL)
        ys5 = np.ascontiguousarray(ys, dtype="<u8").reshape(n * d, NL)
        xm = self._mont_u8(xs5)
        ym = self._mont_u8(ys5)
        yn = self._neg_u8(ym)
        W = d * kp
        return (xm.reshape(n, W), ym.reshape(n, W), yn.reshape(n, W))

    def encode_table(self, points):
        """Host point list -> (device (2m, 2W) uint8 doubled X||(+-Y)
        affine table, infinity mask).  Infinite rows are excluded by the
        scheduler, never gathered."""
        from ..native import _points_to_arrays

        ec = self.ec
        d = getattr(ec, "d", 1)
        inf = np.array([p.is_infinity() for p in points], dtype=bool)
        xs, ys, _ = _points_to_arrays(points, d)
        Xu8, Yu8, Ynu8 = self._coords_u8(xs, ys, len(points))
        return self._doubled_u8(Xu8, Yu8, Ynu8, inf), inf

    def table_from_limbs(self, xs, ys, inf):
        """Canonical u64 limb coordinate arrays (native EncodedPoints
        layout) -> doubled uint8 device table; Montgomery encode runs on
        the HOST C++ tier (canonical outputs are exactly 8-bit limbs)."""
        n = xs.shape[0]
        Xu8, Yu8, Ynu8 = self._coords_u8(xs, ys, n)
        return self._doubled_u8(Xu8, Yu8, Ynu8, inf), np.asarray(inf, bool)

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
            return StreamSchedule(perm, loads, bidx, T, self.L)
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
        memory (a no-op for small windows).  Uploaded slices are
        memoized ON the schedule object: a schedule built without
        infinity masking is table-agnostic, so the prover reuses one
        schedule (and one upload) across the a/b1/b2 query MSMs — the
        schedule wire is the warm-step critical path."""
        dev = getattr(sched, "_dev", None)
        if dev is not None:
            accs = [self._madd_win_dev(XY, plo, phi, lw)
                    for plo, phi, lw in dev]
            stacked = tuple(jnp.stack([a[i] for a in accs])
                            for i in range(3))
            return self._finish_dev(
                stacked, jnp.asarray(sched.bidx.reshape(-1)),
                jnp.asarray(sched.runrem.reshape(-1).astype(np.int32)),
                sched.maxrun)
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
        dev = []
        for w in range(self.nwin):
            plo = jax.device_put(sched.perm_lo[w])
            phi = jax.device_put(sched.perm_hi[w])
            lw = jax.device_put(sched.loads[w])
            dev.append((plo, phi, lw))
            accs.append(self._madd_win_dev(XY, plo, phi, lw))
            lag = w - max_inflight
            if lag >= 0 and w % stride == 0:
                float(accs[lag][0][0, 0])
        sched._dev = dev
        stacked = tuple(jnp.stack([a[i] for a in accs])
                        for i in range(3))
        return self._finish_dev(
            stacked, jnp.asarray(sched.bidx.reshape(-1)),
            jnp.asarray(sched.runrem.reshape(-1).astype(np.int32)),
            sched.maxrun)

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
