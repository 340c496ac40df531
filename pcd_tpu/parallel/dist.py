"""Distributed Groth16 prover data-plane (VERDICT round-2 item 5):
the quotient-polynomial FFT pipeline and the proving MSMs sharded over a
jax device mesh.

h-poly pipeline (one shard_map program, no host round-trips):
  a_ev/b_ev/c_ev on H  --inverse 4-step-->  coeffs (natural layout)
  --coset scale g^i-->  --forward 4-step-->  coset evals (transposed
  (k1,k2) order -- harmless: all three share it)  --pointwise
  (a*b - c) * zh_inv-->  --inverse 4-step-->  --scale g^-i-->  h coeffs.

The inverse transform is the forward pipeline's stages run backwards
(row iFFTs, inverse all_to_all transpose, conjugate twiddles, column
iFFTs), which returns the NATURAL layout exactly — so no global reorder
is ever materialized; the only cross-chip traffic is the two all_to_all
stage transposes per transform (Ulysses pattern, SURVEY.md §2c).

MSMs ride `sharded_msm` (points + digit columns sharded, partials
all_gathered and tree-combined on every chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fft_tensor import fft_ctx
from ..ops.limbs import ctx_for, ints_to_limbs_np
from ..poly.domain import EvaluationDomain


def _split(N: int, ndev: int):
    """N = n1*n2 with ndev | n1 and ndev | n2, n1 as square as possible."""
    best = None
    for n1 in range(ndev, N + 1):
        if N % n1:
            continue
        n2 = N // n1
        if n1 % ndev or n2 % ndev:
            continue
        score = abs(n1 - n2)
        if best is None or score < best[0]:
            best = (score, n1, n2)
    if best is None:
        raise ValueError(f"no (n1, n2) split of {N} for {ndev} devices")
    return best[1], best[2]


class DistHPoly:
    """Distributed (A*B - C)/Z_H coset pipeline over a mesh."""

    def __init__(self, F, N: int, mesh: Mesh, axis: str = "shard"):
        self.F = F
        self.N = N
        self.mesh = mesh
        self.axis = axis
        self.fp = ctx_for(F.MODULUS)
        ndev = mesh.shape[axis]
        self.ndev = ndev
        n1, n2 = _split(N, ndev)
        self.n1, self.n2 = n1, n2
        self.ctx1 = fft_ctx(F, n1)
        self.ctx2 = fft_ctx(F, n2)
        dom = EvaluationDomain(F, N)
        p = F.MODULUS
        w = dom.omega
        winv = pow(w, -1, p)
        g = dom.coset_shift
        ginv = pow(g, -1, p)
        ninv = pow(N, -1, p)

        fp = self.fp

        def _geom(first: int, ratio: int, count: int) -> list:
            out = [0] * count
            cur = first
            for i in range(count):
                out[i] = cur
                cur = cur * ratio % p
            return out

        def table_stage(base):
            # stage twiddles base^(r*c), natural (r, c) layout: row r is a
            # geometric sequence with ratio base^r — 2N mults total instead
            # of N modpows (the round-2 version cost ~log2(N) x more)
            rows, br = [], 1
            for _ in range(n1):
                rows.extend(_geom(1, br, n2))
                br = br * base % p
            return jnp.asarray(fp.encode(rows).reshape(n1, n2, fp.k))

        def table_coset(base):
            # sigma layout: position (k1, k2) holds base^(k2*n1 + k1)
            # = base^k1 * (base^n1)^k2 — again pure geometric accumulation
            ratio = pow(base, n1, p)
            rows, bk = [], 1
            for _ in range(n1):
                rows.extend(_geom(bk, ratio, n2))
                bk = bk * base % p
            return jnp.asarray(fp.encode(rows).reshape(n1, n2, fp.k))

        self.tw_f = table_stage(w)
        self.tw_i = table_stage(winv)
        # coset scales act on COEFFICIENTS, which live in sigma order
        self.coset_s = table_coset(g)
        self.coset_inv_s = table_coset(ginv)
        zh_inv = pow(dom.vanishing_poly_at(g), -1, p)
        self.zh_inv = jnp.asarray(fp.to_mont_host(zh_inv))

        ctx1, ctx2 = self.ctx1, self.ctx2
        ax = axis

        def fwd_inv(x, twi):
            """natural evals (n1, n2/D, K) -> sigma coeffs (n1/D, n2, K):
            4-step inverse DFT (column iFFTs, conj twiddles, stage
            transpose, row iFFTs; the 1/N splits into the two iFFTs)."""
            a1 = jnp.moveaxis(ctx1.ifft(jnp.moveaxis(x, 1, 0)), 0, 1)
            a2 = fp.mont_mul(a1, twi)
            a3 = jax.lax.all_to_all(a2, ax, split_axis=0, concat_axis=1,
                                    tiled=True)
            return ctx2.ifft(a3)

        def back(c, twf):
            """sigma coeffs -> natural evals: the stage-exact inverse of
            fwd_inv (row FFTs, inverse transpose, twiddles, column FFTs).
            back(fwd_inv(x)) == x, so no reorder is ever materialized."""
            a3 = ctx2.fft(c)
            a2 = jax.lax.all_to_all(a3, ax, split_axis=1, concat_axis=0,
                                    tiled=True)
            a1 = fp.mont_mul(a2, twf)
            return jnp.moveaxis(ctx1.fft(jnp.moveaxis(a1, 1, 0)), 0, 1)

        def local(a, b, c, twf, twi, cos_s, cosi_s, zh):
            outs = []
            for ev in (a, b, c):
                coeffs_s = fwd_inv(ev, twi)
                scaled_s = fp.mont_mul(coeffs_s, cos_s)
                outs.append(back(scaled_s, twf))  # evals on gH, natural
            prod = fp.sub(fp.mont_mul(outs[0], outs[1]), outs[2])
            h_cos = fp.mont_mul(prod, jnp.broadcast_to(zh, prod.shape))
            hhat_s = fwd_inv(h_cos, twi)          # coeffs of h(gX), sigma
            return fp.mont_mul(hhat_s, cosi_s)    # h coeffs, sigma order

        self._run = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, ax, None), P(None, ax, None),
                      P(None, ax, None), P(None, ax, None),
                      P(None, ax, None), P(ax, None, None),
                      P(ax, None, None), P(None)),
            out_specs=P(ax, None, None),
            check_vma=False,
        ))

    def _shard_nat(self, arr):
        return jax.device_put(
            arr, NamedSharding(self.mesh, P(None, self.axis, None)))

    def _shard_sigma(self, arr):
        return jax.device_put(
            arr, NamedSharding(self.mesh, P(self.axis, None, None)))

    def encode_evals(self, evals):
        A = self.fp.encode(list(evals) + [0] * (self.N - len(evals)))
        return self._shard_nat(jnp.asarray(A.reshape(self.n1, self.n2,
                                                     self.fp.k)))

    def h_poly(self, a_ev, b_ev, c_ev):
        """Host eval lists -> host h coefficient list (length N)."""
        A, B, C = (self.encode_evals(v) for v in (a_ev, b_ev, c_ev))
        out = self._run(A, B, C, self._shard_nat(self.tw_f),
                        self._shard_nat(self.tw_i),
                        self._shard_sigma(self.coset_s),
                        self._shard_sigma(self.coset_inv_s), self.zh_inv)
        flat = self.fp.decode(np.asarray(out).reshape(-1, self.fp.k))
        # sigma position (k1, k2) holds coefficient k2*n1 + k1
        h = [0] * self.N
        i = 0
        for k1 in range(self.n1):
            for k2 in range(self.n2):
                h[k2 * self.n1 + k1] = flat[i]
                i += 1
        return h


class DistMatVec:
    """Constraint-row-sharded sparse matvec over a mesh (SP — SURVEY.md
    §2c / BASELINE 'witness generation sharded over constraints').

    The three R1CS matrices' COO entries are partitioned into contiguous
    row ranges (one per device, padded to a common entry count with
    sentinel rows), each chip runs the segmented-scan row evaluation on
    its slice with the z-vector replicated, and the outputs come back
    row-sharded — nothing is gathered until the FFT boundary.
    """

    MAX_CHUNK = 1 << 19

    def __init__(self, F, rows, n_rows: int, n_cols: int, mesh: Mesh,
                 axis: str = "shard"):
        """rows: list of (a_lc, b_lc, c_lc) dicts in column index space."""
        self.fp = ctx_for(F.MODULUS)
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        self.ndev = ndev
        self.n_rows = n_rows
        self.rows_per_dev = (n_rows + ndev - 1) // ndev
        p = F.MODULUS
        R = self.fp.R

        self._mats = []
        for k in range(3):
            ri, ci, vi = [], [], []
            for r, row in enumerate(rows):
                for c, v in sorted(row[k].items()):
                    if v % p:
                        ri.append(r)
                        ci.append(c)
                        vi.append(v % p * R % p)
            self._mats.append(self._partition(
                np.asarray(ri, np.int32), np.asarray(ci, np.int32), vi))

        fp = self.fp
        rpd = self.rows_per_dev

        def local(ri, ci, vals, flags, ends, offs, z_mont):
            # shard_map local shapes: (1, nchunk, CH[, K]) — one device row
            ri, ci = ri[0], ci[0]
            vals, flags, ends = vals[0], flags[0], ends[0]
            off = offs[0]
            nchunk = ri.shape[0]

            def chunk(j, acc):
                terms = fp.mont_mul(vals[j], z_mont[ci[j]])

                def comb(a, b):
                    fa, va = a
                    fb, vb = b
                    s = fp.add(va, vb)
                    return (fa | fb, fp.select(fb, vb, s))

                _, scanned = jax.lax.associative_scan(
                    comb, (flags[j], terms), axis=0)
                # sentinel-padded rows clamp into the dropped overflow slot
                idx = jnp.where(ends[j],
                                jnp.minimum(ri[j] - off, jnp.int32(rpd)),
                                jnp.int32(rpd))
                blk = jnp.zeros((rpd + 1, fp.k), dtype=jnp.uint32)
                blk = blk.at[idx].set(scanned)
                # rows split across chunk boundaries contribute partial
                # sums from each chunk — modular add, not overwrite
                return fp.add(acc, blk[:rpd])

            out = jax.lax.fori_loop(
                0, nchunk, chunk,
                jnp.zeros((rpd, fp.k), dtype=jnp.uint32))
            return out[None]

        ax = axis
        self._run = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(None)),
            out_specs=P(ax),
            check_vma=False,
        ))

    def _partition(self, ri, ci, vals_mont_ints):
        """Split COO (row-sorted) into per-device row ranges; pad every
        device to the same chunked entry shape (sentinel rows scatter to
        the dropped overflow slot)."""
        fp = self.fp
        ndev, rpd = self.ndev, self.rows_per_dev
        vals_np = ints_to_limbs_np(vals_mont_ints, fp.k)
        bounds = np.searchsorted(ri, np.arange(1, ndev + 1) * rpd)
        starts = np.concatenate([[0], bounds[:-1]])
        max_e = max(int((bounds - starts).max()), 1)
        ch = min(self.MAX_CHUNK, 1 << int(np.ceil(np.log2(max(max_e, 2)))))
        e_pad = ((max_e + ch - 1) // ch) * ch
        nchunk = e_pad // ch

        sent = np.int32(self.n_rows + 1)  # > any real row; maps past rpd
        Ri = np.full((ndev, e_pad), sent, np.int32)
        Ci = np.zeros((ndev, e_pad), np.int32)
        Vi = np.zeros((ndev, e_pad, fp.k), np.uint32)
        for d in range(ndev):
            s, e = int(starts[d]), int(bounds[d])
            Ri[d, : e - s] = ri[s:e]
            Ci[d, : e - s] = ci[s:e]
            Vi[d, : e - s] = vals_np[s:e]
        prev = np.concatenate([np.full((ndev, 1), -1, np.int32),
                               Ri[:, :-1]], axis=1)
        flags = Ri != prev
        ends = np.concatenate([Ri[:, 1:] != Ri[:, :-1],
                               np.ones((ndev, 1), bool)], axis=1)
        sh = NamedSharding(self.mesh, P(self.axis))
        put = lambda a: jax.device_put(jnp.asarray(a), sh)

        def resh(a, tail=()):
            return a.reshape((self.ndev, nchunk, ch) + tail)

        offs = (np.arange(ndev) * rpd).astype(np.int32)
        return (put(resh(Ri)), put(resh(Ci)), put(resh(Vi, (fp.k,))),
                put(resh(flags)), put(resh(ends)),
                jax.device_put(jnp.asarray(offs), sh))

    def apply_all(self, z_mont):
        """z (n_cols, K) Montgomery -> list of three (ndev*rpd, K) arrays,
        row-sharded over the mesh (rows beyond n_rows are zero)."""
        outs = []
        for mat in self._mats:
            ri, ci, vi, fl, en, offs = mat
            out = self._run(ri, ci, vi, fl, en, offs, z_mont)
            outs.append(out.reshape(-1, self.fp.k))
        return outs


class DistContext:
    """Mesh-wide prover context: sharded MSM + distributed h-poly,
    injected into Groth16 via `groth16.dist = DistContext(mesh)`."""

    def __init__(self, mesh: Mesh, axis: str = "shard"):
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self._msm_cache = {}
        self._h_cache = {}
        self._query_cache = {}
        self._stream_cache = {}
        self._stream_tables = {}

    # -- distributed STREAM MSM (the production tier; VERDICT r4 item 4:
    # -- the mesh must shard the stream architecture, not the legacy scan)
    def _stream_params(self, n: int):
        """(c, lanes) sized to the per-device point shard: lanes bound the
        VMEM accumulator footprint and must cover every nonempty bucket
        (ops/msm_stream.StreamMSMCtx asserts lanes > B//8)."""
        n_loc = max(1, n // self.ndev)
        if n_loc >= 16384:
            return 12, 4096
        if n_loc >= 2048:
            return 10, 1024
        return 8, 256

    def stream_msm(self, curve, scalar_bits: int, points, scalars):
        """Point-sharded stream MSM over a host point list (table cached
        per query identity): each chip schedules + accumulates its point
        shard on its table shard, per-chip window sums are all_gathered
        and tree-combined in-graph, Horner tail on host."""
        from .stream_dist import ShardedStreamMSM

        n = len(points)
        c, lanes = self._stream_params(n)
        key = (curve, scalar_bits, c, lanes)
        smsm = self._stream_cache.get(key)
        if smsm is None:
            smsm = ShardedStreamMSM(curve, scalar_bits, self.mesh,
                                    self.axis, c=c, lanes=lanes)
            self._stream_cache[key] = smsm
        tkey = (id(points), key)
        tab = self._stream_tables.get(tkey)
        if tab is None:
            tab = smsm.encode_table(points)
            self._stream_tables[tkey] = tab
        XY, infs = tab
        nbytes = (scalar_bits + 63) // 64 * 8
        limbs = smsm.sctx.limb_rows([int(s) for s in scalars], nbytes)
        return smsm.msm_limbs(XY, limbs, infs)

    def h_poly(self, F, N):
        """DistHPoly for (F, N), or None when N has no (n1, n2) split with
        both factors divisible by the device count (the caller falls back
        to the single-chip pipeline)."""
        key = (F.MODULUS, N)
        if key not in self._h_cache:
            try:
                self._h_cache[key] = DistHPoly(F, N, self.mesh, self.axis)
            except ValueError:
                self._h_cache[key] = None
        return self._h_cache[key]

    def matvec(self, F, rows, n_rows: int, n_cols: int) -> DistMatVec:
        """Row-sharded Az/Bz/Cz evaluator for one constraint system
        (callers cache it on the pk — partitioning touches every nnz)."""
        return DistMatVec(F, rows, n_rows, n_cols, self.mesh, self.axis)

    def _padded_query(self, arrays, n: int, m: int):
        """Pad the point arrays to m and place them sharded over the mesh
        (cached per query identity — pk query tables are reused across
        every prove, so the pad + reshard must not be paid per call)."""
        key = (id(arrays[0]), m)
        hit = self._query_cache.get(key)
        if hit is not None:
            return hit
        if m != n:
            arrays = tuple(jnp.pad(a, [(0, m - n)] + [(0, 0)] * (a.ndim - 1))
                           for a in arrays)
        sharded = tuple(
            jax.device_put(a, NamedSharding(
                self.mesh, P(*([self.axis] + [None] * (a.ndim - 1)))))
            for a in arrays)
        self._query_cache[key] = sharded
        return sharded

    def msm(self, mctx, arrays, digits):
        """Sharded MSM (u32 or f32 backend): device window sums combined
        across chips + host Horner tail; returns a host point."""
        from .mesh import sharded_window_sums

        n = digits.shape[1]
        # pad to a power of two (collapses compiled shapes) that the mesh
        # divides; zero digits land in the dropped zero bucket
        m = self.ndev
        while m < n:
            m *= 2
        arrays = self._padded_query(arrays, n, m)
        if m != n:
            digits = jnp.pad(digits, [(0, 0), (0, m - n)])
        key = (id(mctx), m)
        if key not in self._msm_cache:
            self._msm_cache[key] = sharded_window_sums(
                mctx, self.mesh, self.axis)
        ws = self._msm_cache[key](arrays, digits)
        wsn = tuple(np.asarray(c) for c in ws)
        acc = mctx.curve.infinity()
        for w in reversed(range(mctx.nwin)):
            for _ in range(mctx.c):
                acc = acc.double()
            acc = acc + mctx.ec.decode_point(tuple(c[w] for c in wsn))
        return acc
