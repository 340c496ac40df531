"""Device sparse matrix-vector products over prime fields (SURVEY.md:
'R1CS witness generation sharded over constraints' — the Az/Bz/Cz row
evaluations feeding the QAP/SAP provers).

COO entries (sorted by row) are evaluated as  terms = val * z[col]  with a
segmented modular sum (flag + associative scan — same branch-free pattern
as the MSM bucket stage), then segment ends are scattered to rows.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import ctx_for, ints_to_limbs_np


class SparseMatVec:
    """One sparse matrix (rows x cols) over Fp, device-resident.

    nnz is split into power-of-two chunks of at most MAX_CHUNK entries so
    the segmented-scan working set stays bounded regardless of matrix size
    (real MainCircuits exceed 2^21 nnz); chunk partial row-sums are added.
    All full chunks share one shape, so XLA compiles the scan body once."""

    MAX_CHUNK = 1 << 19

    def __init__(self, F, rows_idx, cols_idx, vals, n_rows: int):
        """rows_idx must be sorted ascending; vals are ints mod p."""
        self.fp = ctx_for(F.MODULUS)
        self.F = F
        self.n_rows = n_rows
        p = self.fp.p
        R = self.fp.R
        n = len(rows_idx)
        rows_np = np.asarray(rows_idx, np.int32)
        cols_np = np.asarray(cols_idx, np.int32)
        self.chunks = []
        for s in range(0, max(n, 1), self.MAX_CHUNK):
            ri = rows_np[s : s + self.MAX_CHUNK]
            ci = cols_np[s : s + self.MAX_CHUNK]
            vi = vals[s : s + self.MAX_CHUNK]
            cn = len(ri)
            m = 1
            while m < max(cn, 2):
                m *= 2
            pad = m - cn
            ri = np.concatenate([ri, np.full(pad, n_rows, np.int32)])
            ci = np.concatenate([ci, np.zeros(pad, np.int32)])
            vals_mont = ints_to_limbs_np(
                [v * R % p for v in vi] + [0] * pad, self.fp.k)
            prev = np.concatenate([[-1], ri[:-1]])
            flags = ri != prev
            is_end = np.concatenate([ri[1:] != ri[:-1], [True]])
            self.chunks.append((jnp.asarray(ri), jnp.asarray(ci),
                                jnp.asarray(vals_mont), jnp.asarray(flags),
                                jnp.asarray(is_end)))

    def apply(self, z_mont):
        """z_mont: (n_cols, K) Montgomery limbs -> (n_rows, K) row sums
        in Montgomery form (rows without entries = 0).

        The COO arrays are passed as jit ARGUMENTS (a captured-constant
        formulation bakes gigabytes into the lowered program)."""
        out = None
        for (rows, cols, vals, flags, end_positions) in self.chunks:
            part = _apply_jit(self.fp, self.n_rows, rows, cols,
                              vals, flags, end_positions, z_mont)
            out = part if out is None else _add_jit(self.fp, out, part)
        return out


@partial(jax.jit, static_argnums=(0, 1))
def _apply_jit(fp, n_rows, rows, cols, vals, flags, end_positions, z_mont):
    terms = fp.mont_mul(vals, z_mont[cols])

    def comb(a, b):
        fa, va = a
        fb, vb = b
        s = fp.add(va, vb)
        v = fp.select(fb, vb, s)
        return (fa | fb, v)

    _, scanned = jax.lax.associative_scan(comb, (flags, terms), axis=0)
    out = jnp.zeros((n_rows + 1, fp.k), dtype=jnp.uint32)
    idx = jnp.where(end_positions, rows, jnp.int32(n_rows))
    out = out.at[idx].set(scanned)
    return out[: n_rows]


@partial(jax.jit, static_argnums=(0,))
def _add_jit(fp, a, b):
    return fp.add(a, b)


def matrices_to_device(F, rows, n_rows: int, n_cols: int):
    """rows: list of (a_lc, b_lc, c_lc) dicts in column space ->
    three SparseMatVec objects (COO row-major)."""
    out = []
    for k in range(3):
        ri, ci, vi = [], [], []
        for r, row in enumerate(rows):
            for c, v in sorted(row[k].items()):
                if v % F.MODULUS:
                    ri.append(r)
                    ci.append(c)
                    vi.append(v % F.MODULUS)
        out.append(SparseMatVec(F, ri, ci, vi, n_rows))
    return tuple(out)


def eval_rows_device(mats, z_ints, F):
    """Az, Bz, Cz as int lists (length n_rows) via the device matvecs."""
    fp = ctx_for(F.MODULUS)
    z_mont = jnp.asarray(fp.encode(z_ints))
    outs = []
    for m in mats:
        res = m.apply(z_mont)
        outs.append(fp.decode(np.asarray(res)))
    return outs
