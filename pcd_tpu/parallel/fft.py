"""Distributed FFT via the 4-step (Bailey) decomposition with an
all_to_all stage transpose (SURVEY.md §2c — the Ulysses-style pattern for
sharding ONE large transform across chips; the batch-sharded variant for
many polynomials lives in the prover pipelines).

N = N1 * N2, input x viewed as A[n1, n2] (row-major):
  1. length-N1 FFTs along columns      (n2 sharded -> local)
  2. twiddle multiply by w_N^(k1 n2)   (local)
  3. all_to_all transpose              (k1 becomes the sharded axis)
  4. length-N2 FFTs along rows         (local)
Output element X[k2 N1 + k1] = A4[k1, k2].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fft_tensor import fft_ctx
from ..ops.limbs import ctx_for
from ..poly.domain import EvaluationDomain


class DistributedFFT:
    def __init__(self, F, n1: int, n2: int, mesh: Mesh, axis: str = "shard"):
        self.F = F
        self.n1, self.n2 = n1, n2
        self.N = n1 * n2
        self.mesh = mesh
        self.axis = axis
        self.fp = ctx_for(F.MODULUS)
        self.ctx1 = fft_ctx(F, n1)
        self.ctx2 = fft_ctx(F, n2)
        dom = EvaluationDomain(F, self.N)
        # full twiddle table w_N^(k1*n2), (n1, n2), Montgomery — built from
        # vectorized powers (host, once)
        p = F.MODULUS
        w = dom.omega
        col = [pow(w, k1, p) for k1 in range(n1)]
        rows = []
        for k1 in range(n1):
            rows.append([pow(col[k1], n2_, p) for n2_ in range(n2)])
        flat = [v for r in rows for v in r]
        self.twiddle = jnp.asarray(
            self.fp.encode(flat).reshape(n1, n2, self.fp.k))

        ndev = mesh.shape[axis]
        assert n2 % ndev == 0 and n1 % ndev == 0
        self.ndev = ndev

        fp = self.fp
        ctx1, ctx2 = self.ctx1, self.ctx2
        tw = self.twiddle

        def local(a_block, tw_block):
            # a_block: (n1, n2/D, K) — columns are complete locally
            a1 = ctx1.fft(jnp.moveaxis(a_block, 1, 0))   # (n2/D, n1, K)
            a1 = jnp.moveaxis(a1, 0, 1)                  # (n1, n2/D, K)
            a2 = fp.mont_mul(a1, tw_block)
            # all_to_all stage transpose: split the k1 axis across chips,
            # gather full rows (n2) locally
            a3 = jax.lax.all_to_all(a2, self.axis, split_axis=0,
                                    concat_axis=1, tiled=True)
            a4 = ctx2.fft(a3)                            # (n1/D, n2, K)
            return a4

        self._local = local

        self.run = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis, None), P(None, axis, None)),
            out_specs=P(axis, None, None),
            check_vma=False,
        ))

    # -- host helpers ------------------------------------------------------
    def encode_input(self, coeffs):
        """coeffs (length <= N) -> sharded device array (n1, n2, K)."""
        A = self.fp.encode(list(coeffs) + [0] * (self.N - len(coeffs)))
        A = A.reshape(self.n1, self.n2, self.fp.k)
        return jax.device_put(
            jnp.asarray(A), NamedSharding(self.mesh, P(None, self.axis, None)))

    def sharded_twiddle(self):
        return jax.device_put(
            self.twiddle, NamedSharding(self.mesh, P(None, self.axis, None)))

    def fft(self, coeffs):
        """Full pipeline; returns evaluations in natural order (host list)."""
        out = self.run(self.encode_input(coeffs), self.sharded_twiddle())
        vals = self.fp.decode(np.asarray(out).reshape(-1, self.fp.k))
        # out[k1, k2] = X[k2*n1 + k1] -> reorder
        X = [0] * self.N
        i = 0
        for k1 in range(self.n1):
            for k2 in range(self.n2):
                X[k2 * self.n1 + k1] = vals[i]
                i += 1
        return X
