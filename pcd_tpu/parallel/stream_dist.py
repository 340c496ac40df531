"""Distributed STREAM MSM — the production TPU MSM tier sharded over a
device mesh (SURVEY.md §2c D4 "first-class distributed component";
VERDICT r4 item 4: the multi-chip story must distribute the stream MSM,
not the deprecated scan path).

Strategy: DP over points.  MSM is linear in its point set, so each chip
holds a SHARD of the doubled uint8 table and a host-built stream
schedule covering only its points; every chip runs the full per-window
pipeline (gather -> fused madd rounds with VMEM lane accumulators ->
two-phase bucket finish) locally with ZERO cross-chip traffic, then the
tiny (nwin, KW) per-chip window sums are all_gathered over ICI and
tree-combined with batched EC adds inside the same shard_map program.
The Horner tail (c doublings + one add per window) stays on host, as in
the single-chip path (ops/msm_stream.py).

Why DP and not window sharding: point shards balance perfectly at any
device count, the table shards with them (tables larger than one chip's
HBM keep working), and the only collective is nwin points per chip.
The non-scaling part is the bucket finish (each chip reduces its own
partial buckets for all windows — Amdahl fixed cost); at production
sizes the madd phase dominates.

Reference parity: prover MSMs of Groth16/GM17/Marlin (hot call sites
ec_cycle_pcd/mod.rs:171,179); the reference itself is single-process
(SURVEY.md §2c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.msm_stream import StreamMSMCtx, stream_ctx


class ShardedStreamMSM:
    """Point-sharded stream MSM over a mesh.

    Usage:
        smsm = ShardedStreamMSM(curve, scalar_bits, mesh, lanes=1024)
        XY, infs = smsm.encode_table(points)      # sharded device table
        out = smsm.msm_limbs(XY, limbs, infs)     # host point
    """

    def __init__(self, curve, scalar_bits: int, mesh: Mesh,
                 axis: str = "shard", c: int = 12, lanes: int = 8192):
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self.sctx: StreamMSMCtx = stream_ctx(curve, scalar_bits, c, lanes)
        self._fns = {}

    # -- host prep ---------------------------------------------------------
    def _pad_n(self, n: int) -> int:
        return -(-n // self.ndev) * self.ndev

    def encode_table(self, points):
        """Point list -> ((ndev, 2m_loc, 2W) uint8 table sharded over the
        mesh, per-shard infinity masks).  The point axis is padded to a
        multiple of the device count with infinities (excluded by the
        scheduler, never gathered)."""
        from ..native import _points_to_arrays

        sctx = self.sctx
        d = getattr(sctx.ec, "d", 1)
        n = len(points)
        m = self._pad_n(n)
        inf = np.array([p.is_infinity() for p in points]
                       + [True] * (m - n), dtype=bool)
        xs, ys, _ = _points_to_arrays(points, d)
        if m != n:
            xs = np.pad(xs, [(0, m - n), (0, 0)])
            ys = np.pad(ys, [(0, m - n), (0, 0)])
        return self.table_from_limbs(xs, ys, inf)

    def table_from_limbs(self, xs, ys, inf):
        """Canonical u64 limb coords (n rows, n % ndev == 0) -> sharded
        doubled uint8 table + per-shard inf masks."""
        sctx = self.sctx
        n = xs.shape[0]
        assert n % self.ndev == 0
        n_loc = n // self.ndev
        inf = np.asarray(inf, dtype=bool)
        Xu8, Yu8, Ynu8 = sctx._coords_u8(xs, ys, n)
        shards = []
        infs = []
        for dv in range(self.ndev):
            s = slice(dv * n_loc, (dv + 1) * n_loc)
            shards.append(np.asarray(sctx._doubled_u8(
                Xu8[s], Yu8[s], Ynu8[s], inf[s], to_device=False)))
            infs.append(inf[s])
        XY = jax.device_put(
            np.stack(shards),
            NamedSharding(self.mesh, P(self.axis, None, None)))
        return XY, infs

    def _schedules(self, limbs: np.ndarray, infs):
        """Per-shard host schedules, padded to a common round count."""
        sctx = self.sctx
        n = limbs.shape[0]
        m = self._pad_n(n)
        if m != n:
            limbs = np.pad(limbs, [(0, m - n), (0, 0)])
        n_loc = m // self.ndev
        scheds = [sctx.schedule_any(
            np.ascontiguousarray(limbs[dv * n_loc:(dv + 1) * n_loc]),
            infs[dv] if infs is not None else None)
            for dv in range(self.ndev)]
        T = max(s.T for s in scheds)
        maxrun = max(s.maxrun for s in scheds)
        nwin, L = sctx.nwin, sctx.L

        def padT(a, t):
            return a if t == T else np.pad(a, [(0, 0), (0, T - t), (0, 0)])

        plo = np.stack([padT(s.perm_lo.reshape(nwin, s.T, L), s.T)
                        for s in scheds])
        phi = np.stack([padT(s.perm_hi.reshape(nwin, s.T, L), s.T)
                        for s in scheds])
        loads = np.stack([s.loads for s in scheds])
        bidx = np.stack([s.bidx.reshape(-1) for s in scheds])
        runrem = np.stack([s.runrem.reshape(-1).astype(np.int32)
                           for s in scheds])
        return plo, phi, loads, bidx, runrem, T, maxrun

    # -- device program ------------------------------------------------------
    def _fn(self, T: int, maxrun: int):
        key = (T, maxrun)
        hit = self._fns.get(key)
        if hit is not None:
            return hit
        sctx = self.sctx
        ec = sctx.ec
        nwin = sctx.nwin
        ax = self.axis
        ndev = self.ndev

        def local(XY, plo, phi, loads, bidx, runrem):
            XY, plo, phi = XY[0], plo[0], phi[0]
            loads, bidx, runrem = loads[0], bidx[0], runrem[0]
            accs = [sctx._madd_win_dev(XY, plo[w], phi[w], loads[w])
                    for w in range(nwin)]
            stacked = tuple(jnp.stack([a[i] for a in accs])
                            for i in range(3))
            ws = sctx._finish_dev(stacked, bidx, runrem, maxrun)
            g = tuple(jax.lax.all_gather(c, ax) for c in ws)

            def body(i, acc):
                return ec.add(acc, tuple(c[i] for c in g))

            return jax.lax.fori_loop(1, ndev, body,
                                     tuple(c[0] for c in g))

        fn = jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None, None, None),
                      P(ax, None, None, None), P(ax, None, None),
                      P(ax, None), P(ax, None)),
            out_specs=(P(None, None),) * 3,
            check_vma=False,
        ))
        self._fns[key] = fn
        return fn

    # -- entry points ---------------------------------------------------------
    def window_sums(self, XY, limbs: np.ndarray, infs=None):
        """Sharded table + (n, NL) u64 canonical limb scalars -> replicated
        (nwin, KW) window-sum device arrays (non-blocking dispatch)."""
        plo, phi, loads, bidx, runrem, T, maxrun = \
            self._schedules(limbs, infs)
        sh = lambda a: jax.device_put(a, NamedSharding(
            self.mesh, P(*([self.axis] + [None] * (a.ndim - 1)))))
        fn = self._fn(T, maxrun)
        return fn(XY, sh(plo), sh(phi), sh(loads), sh(bidx), sh(runrem))

    def msm_limbs(self, XY, limbs: np.ndarray, infs=None):
        ws = self.window_sums(XY, limbs, infs)
        return self.sctx.horner_host(tuple(np.asarray(c) for c in ws))

    def msm(self, points, scalars):
        """Host convenience API: point list + int scalars -> host point."""
        assert len(points) == len(scalars) and points
        XY, infs = self.encode_table(points)
        nbytes = (self.sctx.scalar_bits + 63) // 64 * 8
        limbs = self.sctx.limb_rows(scalars, nbytes)
        return self.msm_limbs(XY, limbs, infs)
