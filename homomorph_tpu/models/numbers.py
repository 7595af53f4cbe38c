"""Shipped homomorphic operations over integer types.

Mirrors the reference's operation marker structs and their ``d/delta``
requirements (reference: src/impls/numbers.rs:7-50):

=========================  ================  =============================
Operation                  MIN_D_OVER_DELTA  Circuit
=========================  ================  =============================
HomomorphicAndGate         2                 lane-wise AND (common.rs:5-11)
HomomorphicOrGate          2                 lane-wise OR  (common.rs:13-19)
HomomorphicXorGate         1                 lane-wise XOR (common.rs:21-27)
HomomorphicNotGate         1                 lane-wise NOT (common.rs:29-35)
HomomorphicAddition        21                ripple-carry  (common.rs:37-64)
HomomorphicMultiplication  64 (conservative) column mult   (common.rs:66-163)
=========================  ================  =============================

Where the reference binds these to each primitive type via macros
(src/impls/numbers/uint.rs, int.rs), here a single implementation covers
every width; signed multiplication is selected by the ciphered value's type
descriptor (two's-complement types use the Baugh-Wooley circuit,
uint.rs:88-90 vs int.rs:90-92).
"""

from __future__ import annotations

from .. import codec as _codec
from ..cipher import Ciphered
from ..operations import HomomorphicOperation1, HomomorphicOperation2
from . import circuits

__all__ = [
    "HomomorphicAndGate",
    "HomomorphicOrGate",
    "HomomorphicXorGate",
    "HomomorphicNotGate",
    "HomomorphicAddition",
    "HomomorphicMultiplication",
]


class HomomorphicAndGate(HomomorphicOperation2):
    MIN_D_OVER_DELTA = 2

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.gate_and(a, b)


class HomomorphicOrGate(HomomorphicOperation2):
    MIN_D_OVER_DELTA = 2

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.gate_or(a, b)


class HomomorphicXorGate(HomomorphicOperation2):
    MIN_D_OVER_DELTA = 1

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.gate_xor(a, b)


class HomomorphicNotGate(HomomorphicOperation1):
    MIN_D_OVER_DELTA = 1

    @staticmethod
    def unsafe_apply(a: Ciphered) -> Ciphered:
        return circuits.gate_not(a)


class HomomorphicAddition(HomomorphicOperation2):
    MIN_D_OVER_DELTA = 21

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.add(a, b)


class HomomorphicMultiplication(HomomorphicOperation2):
    # Conservative default until precise bounds are fully documented
    # (src/impls/numbers.rs:47-50).
    MIN_D_OVER_DELTA = 64

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        desc = a.desc
        signed = isinstance(desc, _codec.IntDescriptor) and desc.signed
        if signed:
            return circuits.mul_signed(a, b)
        return circuits.mul_unsigned(a, b)
