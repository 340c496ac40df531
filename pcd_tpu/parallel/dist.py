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
from ..ops.limbs import ctx_for
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

        def table_nat(fn):
            vals = [fn(i) for i in range(N)]
            return jnp.asarray(fp.encode(vals).reshape(n1, n2, fp.k))

        def table_sigma(fn):
            # sigma layout: position (k1, k2) holds index k2*n1 + k1
            vals = [fn(k2 * n1 + k1) for k1 in range(n1)
                    for k2 in range(n2)]
            return jnp.asarray(fp.encode(vals).reshape(n1, n2, fp.k))

        # stage twiddles w^(+-r*c) in natural (r, c) layout
        self.tw_f = table_nat(lambda i: pow(w, (i // n2) * (i % n2), p))
        self.tw_i = table_nat(lambda i: pow(winv, (i // n2) * (i % n2), p))
        # coset scales act on COEFFICIENTS, which live in sigma order
        self.coset_s = table_sigma(lambda i: pow(g, i, p))
        self.coset_inv_s = table_sigma(lambda i: pow(ginv, i, p))
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


class DistContext:
    """Mesh-wide prover context: sharded MSM + distributed h-poly,
    injected into Groth16 via `groth16.dist = DistContext(mesh)`."""

    def __init__(self, mesh: Mesh, axis: str = "shard"):
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self._msm_cache = {}
        self._h_cache = {}

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

    def msm(self, mctx, arrays, digits):
        """Sharded MSM over u32-encoded point arrays; returns host point."""
        from .mesh import sharded_msm

        n = digits.shape[1]
        pad = (-n) % self.ndev
        if pad:
            arrays = tuple(jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
                           for a in arrays)
            digits = jnp.pad(digits, [(0, 0), (0, pad)])
        key = (id(mctx), digits.shape[1])
        if key not in self._msm_cache:
            self._msm_cache[key] = sharded_msm(mctx, self.mesh, self.axis)
        out = self._msm_cache[key](arrays, digits)
        return mctx.ec.decode_point(tuple(np.asarray(c) for c in out))
