"""Independent big-int oracle of the reference algorithm.

A deliberately simple, independently-written Python implementation of the
scheme exactly as the reference describes it (README.md #system and
src/polynomial.rs / src/context.rs / src/cipher.rs), used to cross-check
the TPU implementation - including bit-exact replay from a shared recorded
randomness stream.  Polynomials are Python big-ints (bit i = coefficient of
X^i, the same LSB-first convention as the packed limb layout).
"""

from __future__ import annotations

import numpy as np


def clmul_int(a: int, b: int) -> int:
    r = 0
    while a:
        low = a & -a
        r ^= b << (low.bit_length() - 1)
        a ^= low
    return r


def rem_int(c: int, s: int) -> int:
    assert s != 0, "attempt to divide by zero"
    ds = s.bit_length() - 1
    while c and c.bit_length() - 1 >= ds:
        c ^= s << (c.bit_length() - 1 - ds)
    return c


class OracleStream:
    """Byte stream with the reference's exact consumption pattern."""

    def __init__(self, data: bytes):
        self._data = np.frombuffer(data, dtype=np.uint8)
        self._pos = 0

    def draw(self, n: int) -> np.ndarray:
        out = self._data[self._pos : self._pos + n]
        self._pos += n
        assert out.size == n, "oracle stream exhausted"
        return out

    def rand_poly(self, degree: int) -> int:
        """random(degree): fill degree//64+1 64-bit words, mask above the
        degree bit within the last word, force the degree bit
        (src/polynomial.rs:73-96)."""
        nw = degree // 64 + 1
        raw = self.draw(nw * 8)
        v = int.from_bytes(raw.tobytes(), "little")
        low = v & ((1 << (64 * (nw - 1))) - 1)
        last = (v >> (64 * (nw - 1))) & ((1 << (degree % 64)) - 1)
        last |= 1 << (degree % 64)
        return low | (last << (64 * (nw - 1)))

    def selection(self, tau: int) -> np.ndarray:
        raw = self.draw((tau + 7) // 8)
        return np.unpackbits(raw, bitorder="little")[:tau]


class OracleContext:
    """Full keygen/encrypt/decrypt pipeline on big-ints."""

    def __init__(self, d: int, dp: int, delta: int, tau: int, stream: OracleStream):
        self.d, self.dp, self.delta, self.tau = d, dp, delta, tau
        self.stream = stream
        self.sk: int | None = None
        self.pk: list[int] | None = None

    def keygen(self) -> None:
        self.sk = self.stream.rand_poly(self.d)
        self.pk = []
        for _ in range(self.tau):
            q = self.stream.rand_poly(self.dp)
            r = self.stream.rand_poly(self.delta)
            self.pk.append(clmul_int(self.sk, q) ^ (r << 1))

    def encrypt_bit(self, x: int) -> int:
        sel = self.stream.selection(self.tau)
        c = 0
        for i in range(self.tau):
            if sel[i]:
                c ^= self.pk[i]
        return c ^ (x & 1)

    def encrypt_bytes(self, data: bytes) -> list[int]:
        out = []
        for byte in data:
            for i in range(8):
                out.append(self.encrypt_bit((byte >> i) & 1))
        return out

    def decrypt_bit(self, c: int) -> int:
        return rem_int(c, self.sk) & 1

    def decrypt_bytes(self, cs: list[int]) -> bytes:
        bits = np.array([self.decrypt_bit(c) for c in cs], dtype=np.uint8)
        return np.packbits(bits, bitorder="little").tobytes()
