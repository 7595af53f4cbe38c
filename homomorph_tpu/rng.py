"""Randomness sources.

The reference draws raw bytes from the OS CSPRNG at exactly two places:
polynomial generation (reference: src/polynomial.rs:87) and the per-bit
subset draw during encryption (reference: src/cipher.rs:92-97).  It has no
seeding seam, so bit-exact replay against the reference requires injecting a
recorded byte stream.  This module provides that seam:

* :class:`ThreefrySource` - production CSPRNG driven by ``jax.random``
  (counter-based threefry; deterministic given the seed).
* :class:`RecordedSource` - replays a byte stream verbatim, consuming bytes
  in the exact order and quantity the reference implementation would
  (64-bit-word granularity for polynomials, ``ceil(tau/8)`` bytes per
  encrypted bit).

Byte-consumption contract (must mirror the reference exactly so that a
stream recorded from it replays bit-identically):

* ``random_poly_limbs(degree)`` consumes ``(degree // 64 + 1) * 8`` bytes -
  the reference allocates ``degree/64 + 1`` 64-bit words and fills them all
  (src/polynomial.rs:74-87), then masks bits above ``degree`` and forces the
  degree bit (src/polynomial.rs:89-90).
* ``random_selection_bits(tau)`` consumes ``ceil(tau / 8)`` bytes; bit ``i``
  of the subset is bit ``i % 8`` of byte ``i / 8`` (src/cipher.rs:105-107).
"""

from __future__ import annotations

import abc
import os

import numpy as np

from .utils.errors import RandomnessError

LIMB_BITS = 32


class RandomSource(abc.ABC):
    """Abstract byte-stream randomness source (host side)."""

    @abc.abstractmethod
    def draw_bytes(self, n: int) -> np.ndarray:
        """Return ``n`` random bytes as a uint8 array."""


_ROTATIONS = ((13, 15, 26, 6), (17, 29, 16, 24))
_THREEFRY_C = np.uint32(0x1BD11BDA)


def _threefry2x32(k0: np.uint32, k1: np.uint32, c0: np.ndarray, c1: np.ndarray):
    """Vectorized Threefry-2x32 (20 rounds) over counter arrays.

    Pure numpy so randomness never touches the device: each draw used to be
    a tiny jax program + host transfer, and key generation makes 2*tau+1
    sequential draws - over this environment's tunneled TPU (~30ms+ RTT per
    transfer) that turned keygen into minutes of round-trips.  Counter-based
    and deterministic given (seed, counter), like the jax threefry PRNG
    (independent stream; no cross-compatibility is claimed).
    """
    ks = (k0, k1, _THREEFRY_C ^ k0 ^ k1)
    x0 = (c0 + ks[0]).astype(np.uint32)
    x1 = (c1 + ks[1]).astype(np.uint32)
    for i in range(5):
        for r in _ROTATIONS[i % 2]:
            x0 = (x0 + x1).astype(np.uint32)
            x1 = ((x1 << np.uint32(r)) | (x1 >> np.uint32(32 - r))).astype(np.uint32)
            x1 ^= x0
        x0 = (x0 + ks[(i + 1) % 3]).astype(np.uint32)
        x1 = (x1 + ks[(i + 2) % 3] + np.uint32(i + 1)).astype(np.uint32)
    return x0, x1


class ThreefrySource(RandomSource):
    """Deterministic counter-based source (host-side Threefry-2x32)."""

    def __init__(self, seed: int):
        seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self._k0 = np.uint32(seed >> 32)
        self._k1 = np.uint32(seed & 0xFFFFFFFF)
        self._counter = 0

    def draw_bytes(self, n: int) -> np.ndarray:
        n_blocks = (n + 7) // 8
        ctr = self._counter + np.arange(n_blocks, dtype=np.uint64)
        self._counter += n_blocks
        c0 = (ctr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        c1 = (ctr >> np.uint64(32)).astype(np.uint32)
        x0, x1 = _threefry2x32(self._k0, self._k1, c0, c1)
        out = np.empty((n_blocks, 2), dtype=np.uint32)
        out[:, 0] = x0
        out[:, 1] = x1
        return out.reshape(-1).view(np.uint8)[:n].copy()


class OsRandomSource(RandomSource):
    """OS CSPRNG (``os.urandom``) - the analogue of the reference's
    ``getrandom`` production source (src/polynomial.rs:87, src/cipher.rs:95).

    This is the DEFAULT key-generation source (matching the reference, which
    draws every random byte from the OS CSPRNG)."""

    def draw_bytes(self, n: int) -> np.ndarray:
        return np.frombuffer(os.urandom(n), dtype=np.uint8)


def os_entropy_key():
    """A ``jax.random`` key seeded with full-entropy OS randomness.

    Fills the ENTIRE key space of whatever PRNG implementation jax is
    configured with (threefry: 64 bits; rbg: 128 bits - the key-data
    shape is probed, not hardcoded) from ``os.urandom`` (the reference's
    production entropy source, src/cipher.rs:95), instead of collapsing
    it to a smaller Python-seed space.  Used by
    :class:`~homomorph_tpu.context.Context` to key each device-side
    encryption stream.
    """
    import jax
    import jax.numpy as jnp

    key_shape = jax.random.key_data(jax.random.key(0)).shape
    n_words = int(np.prod(key_shape)) if key_shape else 1
    words = (
        np.frombuffer(os.urandom(4 * n_words), dtype=np.uint32)
        .reshape(key_shape)
        .copy()
    )
    return jax.random.wrap_key_data(jnp.asarray(words))


class RecordedSource(RandomSource):
    """Replays a pre-recorded byte stream; raises when exhausted."""

    def __init__(self, data: bytes | np.ndarray):
        self._data = np.frombuffer(bytes(data), dtype=np.uint8)
        self._pos = 0

    @property
    def remaining(self) -> int:
        return len(self._data) - self._pos

    def draw_bytes(self, n: int) -> np.ndarray:
        if self._pos + n > len(self._data):
            raise RandomnessError(
                f"recorded stream exhausted: need {n} bytes, have {self.remaining}"
            )
        out = self._data[self._pos : self._pos + n]
        self._pos += n
        return out


def bytes_to_limbs(raw: np.ndarray, num_limbs: int) -> np.ndarray:
    """Little-endian bytes -> uint32 limbs, zero-padded to ``num_limbs``."""
    buf = np.zeros(num_limbs * 4, dtype=np.uint8)
    buf[: min(len(raw), len(buf))] = raw[: len(buf)]
    return buf.view("<u4").astype(np.uint32)


def random_poly_limbs(source: RandomSource, degree: int) -> np.ndarray:
    """Uniform polynomial of *exact* degree ``degree``, bit-packed uint32.

    Mirrors the reference generator: fill ``degree//64 + 1`` 64-bit words,
    mask bits above ``degree``, force bit ``degree`` to 1 (monic, exact
    degree; src/polynomial.rs:73-96).  Returns ``degree//32 + 1`` limbs.
    """
    n_words64 = degree // 64 + 1
    raw = source.draw_bytes(n_words64 * 8)
    num_limbs = degree // LIMB_BITS + 1
    limbs = bytes_to_limbs(raw, num_limbs)
    # Mask everything above bit `degree`, then force bit `degree`.
    top = degree % LIMB_BITS
    mask = np.uint32((1 << top) - 1)
    limbs[-1] &= mask
    limbs[-1] |= np.uint32(1 << top)
    return limbs


def random_selection_bits(source: RandomSource, tau: int) -> np.ndarray:
    """Random subset indicator of size ``tau`` (uint8 0/1), LSB-first bytes."""
    raw = source.draw_bytes((tau + 7) // 8)
    bits = np.unpackbits(raw, bitorder="little")
    return bits[:tau]
