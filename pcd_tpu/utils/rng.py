"""Deterministic RNG stack.

The reference derives ALL CRH generators from a `rand_chacha::ChaChaRng`
seeded with 32 bytes (src/variable_length_crh/pedersen/mod.rs:20-35,
bowe_hopwood/mod.rs:52-78) and uses `ark_std::test_rng()` (fixed seed) for
deterministic tests *and inside circuit synthesis* for placeholder proofs
(src/ec_cycle_pcd/data_structures.rs:138,342).

This module provides a clean-room ChaCha20 keystream RNG (RFC 7539 block
function, 20 rounds) with a documented field/point sampling spec.  Note:
`rand_chacha 0.2`'s exact stream/sampling cannot be byte-verified here (dep
sources not vendored — SURVEY.md D16), so the framework fixes its own
deterministic spec; everything downstream (generators, placeholder proofs)
is internally consistent, which is what the construction requires.
"""

from __future__ import annotations

import struct

_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def _rotl(x, n):
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def _quarter(st, a, b, c, d):
    st[a] = (st[a] + st[b]) & 0xFFFFFFFF
    st[d] = _rotl(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & 0xFFFFFFFF
    st[b] = _rotl(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b]) & 0xFFFFFFFF
    st[d] = _rotl(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & 0xFFFFFFFF
    st[b] = _rotl(st[b] ^ st[c], 7)


def chacha20_block(key32: bytes, counter: int, nonce12: bytes) -> bytes:
    state = list(_CONSTANTS)
    state += list(struct.unpack("<8I", key32))
    state.append(counter & 0xFFFFFFFF)
    state += list(struct.unpack("<3I", nonce12))
    work = list(state)
    for _ in range(10):
        _quarter(work, 0, 4, 8, 12)
        _quarter(work, 1, 5, 9, 13)
        _quarter(work, 2, 6, 10, 14)
        _quarter(work, 3, 7, 11, 15)
        _quarter(work, 0, 5, 10, 15)
        _quarter(work, 1, 6, 11, 12)
        _quarter(work, 2, 7, 8, 13)
        _quarter(work, 3, 4, 9, 14)
    out = [(w + s) & 0xFFFFFFFF for w, s in zip(work, state)]
    return struct.pack("<16I", *out)


class ChaChaRng:
    """Deterministic byte stream from a 32-byte seed."""

    SEED_LEN = 32

    def __init__(self, seed: bytes):
        if len(seed) < 32:
            seed = seed + b"\x00" * (32 - len(seed))
        self.key = bytes(seed[:32])
        self.counter = 0
        self.buf = b""

    @classmethod
    def from_int_seed(cls, n: int):
        return cls(n.to_bytes(32, "little"))

    def fill_bytes(self, n: int) -> bytes:
        while len(self.buf) < n:
            self.buf += chacha20_block(self.key, self.counter, b"\x00" * 12)
            self.counter += 1
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def next_u64(self) -> int:
        return int.from_bytes(self.fill_bytes(8), "little")

    def randrange(self, a: int, b: int | None = None) -> int:
        """Uniform in [0, a) — or [a, b) when b given — by rejection
        sampling on the next power-of-two."""
        if b is not None:
            return a + self.randrange(b - a)
        bound = a
        nbytes = (bound.bit_length() + 7) // 8
        mask = (1 << (8 * nbytes)) - 1
        shift = 8 * nbytes - bound.bit_length()
        while True:
            v = int.from_bytes(self.fill_bytes(nbytes), "little") >> shift
            if v < bound:
                return v

    def field_element(self, F):
        """Uniform field element (rejection sampling on BITS bits)."""
        return F.from_int(self.randrange(F.MODULUS))

    def te_point(self, curve):
        """Deterministic point in the prime-order subgroup of a TE curve:
        sample y until (y, sign) lifts; clear cofactor; skip identity."""
        while True:
            y = self.field_element(curve.F)
            sign = self.fill_bytes(1)[0] & 1
            p = curve.lift_y(y, sign_x=sign if sign else 2)
            if p is None:
                continue
            q = p * curve.cofactor
            if not q.is_identity():
                return q


def test_rng() -> ChaChaRng:
    """Fixed-seed RNG (role of ark_std::test_rng; also used for placeholder
    proof determinism inside circuit synthesis)."""
    return ChaChaRng(b"pcd_tpu deterministic test rng!!")
