"""Device mixed-radix FFT over prime-field limb tensors (SURVEY.md D5).

Executes the same radix plan as the host EvaluationDomain as a sequence of
O(#factors) batched tensor stages: per level, r strided sub-transforms are
combined with twiddles gathered from a single precomputed root-power table
(one (n, K) Montgomery table per direction — no per-stage twiddle storage).

Graph size is O(sum of radixes * levels), independent of n; all heavy work
is batched mont_mul over (batch, n, K) tensors.

Distribution note (SURVEY.md §2c): stages are local to the last axis; the
multi-chip variant shards the batch axis (many polynomials) — the
all_to_all transpose variant for sharding a single huge FFT is planned.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..poly.domain import EvaluationDomain
from .limbs import ctx_for


class FFTTensorCtx:
    def __init__(self, F, size: int):
        self.domain = EvaluationDomain(F, size)
        self.fp = ctx_for(F.MODULUS)
        self.n = size
        d = self.domain
        p = F.MODULUS
        # root power tables (Montgomery form)
        self.tbl_fwd = self._pow_table(d.omega)
        self.tbl_inv = self._pow_table(d.omega_inv)
        self.n_inv_mont = np.asarray(self.fp.to_mont_host(d.n_inv))
        self.coset_tbl = self._pow_table(d.coset_shift)
        self.coset_inv_tbl = self._pow_table(d.coset_shift_inv)
        # per-level index plans
        self.levels = self._plan()

    def _pow_table(self, w: int) -> np.ndarray:
        p = self.fp.p
        out = np.zeros((self.n, self.fp.k), dtype=np.uint32)
        cur = 1
        for i in range(self.n):
            out[i] = self.fp.to_mont_host(cur)
            cur = cur * w % p
        return out

    def _plan(self):
        """Bottom-up levels: [(r, m, idx (r, r*m) twiddle indices into the
        n-table)] where the level transforms length r*m from r transforms
        of length m."""
        factors = self.domain.factors
        levels = []
        m = 1
        # recursion splits by smallest factor first at the top; execution
        # order bottom-up is reversed factor list
        for r in reversed(factors):
            n_l = r * m
            stride = self.n // n_l
            idx = np.zeros((r, n_l), dtype=np.int32)
            for j in range(r):
                for k in range(n_l):
                    idx[j, k] = (stride * j * k) % self.n
            levels.append((r, m, idx))
            m = n_l
        return levels

    # -- core transform ---------------------------------------------------
    def _transform(self, a, tbl):
        """a: (..., n, K) Montgomery coefficients -> evaluations."""
        fp = self.fp
        # decimation: recursively splitting by smallest prime factor r
        # (top-down) == bottom-up execution over self.levels with strided
        # deinterleaving applied up front via index permutation.
        perm = self._input_permutation()
        a = a[..., perm, :]
        for (r, m, idx) in self.levels:
            n_l = r * m
            b = a.reshape(a.shape[:-2] + (a.shape[-2] // n_l, r, m, a.shape[-1]))
            # combine: out[..., g, k] = sum_j T[idx[j,k]] * b[..., g, j, k % m]
            acc = None
            for j in range(r):
                tw = tbl[idx[j]]  # (n_l, K)
                sub = jnp.tile(b[..., j, :, :], (1,) * (b.ndim - 3) + (r, 1))
                term = fp.mont_mul(jnp.asarray(tw), sub)
                acc = term if acc is None else fp.add(acc, term)
            a = acc.reshape(a.shape)
        return a

    @lru_cache(maxsize=None)
    def _input_permutation(self):
        """Digit-reversal permutation matching the recursive decimation."""
        def rec(ix, factors):
            if not factors:
                return ix
            r = factors[0]
            return np.concatenate([rec(ix[j::r], factors[1:]) for j in range(r)])

        return np.asarray(rec(np.arange(self.n), self.domain.factors),
                          dtype=np.int32)

    # -- public ops --------------------------------------------------------
    def fft(self, a):
        return self._transform(a, jnp.asarray(self.tbl_fwd))

    def ifft(self, a):
        out = self._transform(a, jnp.asarray(self.tbl_inv))
        ninv = jnp.asarray(self.n_inv_mont)
        return self.fp.mont_mul(out, jnp.broadcast_to(ninv, out.shape))

    def coset_fft(self, a):
        shift = jnp.asarray(self.coset_tbl)
        return self.fft(self.fp.mont_mul(a, shift))

    def coset_ifft(self, a):
        out = self.ifft(a)
        shift = jnp.asarray(self.coset_inv_tbl)
        return self.fp.mont_mul(out, shift)

    # -- host conversions --------------------------------------------------
    def encode(self, coeffs) -> np.ndarray:
        assert len(coeffs) <= self.n
        out = np.zeros((self.n, self.fp.k), dtype=np.uint32)
        for i, c in enumerate(coeffs):
            out[i] = self.fp.to_mont_host(int(c))
        return out

    def decode(self, arr) -> list:
        return self.fp.decode(arr)


@lru_cache(maxsize=None)
def fft_ctx(F, size: int) -> FFTTensorCtx:
    return FFTTensorCtx(F, size)
