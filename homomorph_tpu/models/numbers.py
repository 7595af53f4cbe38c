"""Shipped homomorphic operations over integer types.

Mirrors the reference's operation marker structs and their ``d/delta``
requirements (reference: src/impls/numbers.rs:7-50):

=========================  ================  =============================
Operation                  MIN_D_OVER_DELTA  Circuit
=========================  ================  =============================
HomomorphicAndGate         2 (UNSOUND*)      lane-wise AND (common.rs:5-11)
HomomorphicOrGate          2 (UNSOUND*)      lane-wise OR  (common.rs:13-19)
HomomorphicXorGate         1                 lane-wise XOR (common.rs:21-27)
HomomorphicNotGate         1                 lane-wise NOT (common.rs:29-35)
HomomorphicAddition        21                ripple-carry  (common.rs:37-64)
HomomorphicMultiplication  64 (conservative) carry-save tree (csaplan.py;
                                             reference column circuit
                                             common.rs:66-163 kept as the
                                             oracle + below-width-4 path)
=========================  ================  =============================

(*) The class constants are kept for reference parity only; the checked
API always validates the exact seeded bound via ``requirement_for``.
For AND/OR even FRESH operands need ``d/delta >= 5`` - the published 2
admits ``Parameters(4, 2, 1, 4)`` where a fresh AND's noise degree
``2*(delta+1) = 4 = d`` escapes the envelope (NOISE.md §4).

Extensions NOT in the reference (same trait machinery, see class docs):
``HomomorphicSubtraction`` (21), ``HomomorphicNegation`` (21),
``HomomorphicEquality`` (width-aware: requirement = 2*width+1 via
``requirement_for`` - the exact noise bound; all-widths class constant 257),
``HomomorphicLessThan`` / ``HomomorphicGreaterThan`` (21, borrow-chain
comparison; signed descriptors dispatch to the sign-bit-flipped circuit);
plus ``circuits.le``/``ge``/``select`` (mux).

Where the reference binds these to each primitive type via macros
(src/impls/numbers/uint.rs, int.rs), here a single implementation covers
every width; signed multiplication is selected by the ciphered value's type
descriptor (two's-complement types use the Baugh-Wooley circuit,
uint.rs:88-90 vs int.rs:90-92).
"""

from __future__ import annotations

from .. import codec as _codec
from ..cipher import FRESH_NOISE as _FRESH, Ciphered
from ..operations import (
    HomomorphicOperation1,
    HomomorphicOperation2,
    HomomorphicOperationN,
)
from . import circuits, noise as _noise

__all__ = [
    "HomomorphicAndGate",
    "HomomorphicOrGate",
    "HomomorphicXorGate",
    "HomomorphicNotGate",
    "HomomorphicAddition",
    "HomomorphicMultiplication",
    "HomomorphicSubtraction",
    "HomomorphicNegation",
    "HomomorphicEquality",
    "HomomorphicSum",
    "HomomorphicPopCount",
    "HomomorphicLessThan",
    "HomomorphicGreaterThan",
    "HomomorphicMinimum",
    "HomomorphicMaximum",
]


def _noises(operands) -> "list[int]":
    """Tracked noise seeds of the operands (normalized delta=1 units)."""
    return [c.noise for c in operands]


def _all_fresh(operands) -> bool:
    return all(c.noise <= _FRESH for c in operands)


def _and_or_requirement(operands) -> int:
    """Exact seeded bound for one multiplicative gate: output noise is
    ``na + nb`` (AND multiplies; OR = a+b+ab has the same worst term).
    Applied to FRESH operands too - the reference's published constant 2
    (src/impls/numbers.rs:29-31) is UNSOUND: at ``Parameters(4, 2, 1, 4)``
    it admits a fresh AND whose noise degree ``2*(delta+1) = 4 = d``
    escapes the envelope and decrypts to garbage on S(0)=1 keys (round-4
    verdict reproduction; regression test in tests/test_noise_tracking.py).
    """
    return _noise.required_ratio(sum(_noises(operands)))


class HomomorphicAndGate(HomomorphicOperation2):
    """Lane-wise AND.  The class constant keeps the reference's published
    2 for parity (src/impls/numbers.rs:29-31) and survives only as
    documentation of the reference's (unsound) behaviour: the checked API
    always validates the exact seeded bound (fresh operands need
    ``d/delta >= 5``; NOISE.md §4)."""

    MIN_D_OVER_DELTA = 2

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        return _and_or_requirement(operands)

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.gate_and(a, b)


class HomomorphicOrGate(HomomorphicOperation2):
    """Lane-wise OR (a+b+ab): same exact bound as
    :class:`HomomorphicAndGate` - the ``ab`` term dominates; the class
    constant mirrors the reference's (unsound) published 2."""

    MIN_D_OVER_DELTA = 2

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        return _and_or_requirement(operands)

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.gate_or(a, b)


class HomomorphicXorGate(HomomorphicOperation2):
    """Lane-wise XOR - genuinely degree-free (polynomial add): output
    noise equals the noisier operand's, so on FRESH operands the gate
    cannot introduce any failure encryption itself did not already admit
    and the published constant 1 is kept (unlike AND/OR, audited sound).
    Composed operands still validate the tracked absolute envelope."""

    MIN_D_OVER_DELTA = 1

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        if _all_fresh(operands):
            return cls.MIN_D_OVER_DELTA
        return _noise.required_ratio(max(_noises(operands)))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.gate_xor(a, b)


class HomomorphicNotGate(HomomorphicOperation1):
    """Lane-wise NOT (xor with the trivial one) - degree-free like XOR;
    the fresh-operand published constant 1 is sound (see
    :class:`HomomorphicXorGate`)."""

    MIN_D_OVER_DELTA = 1

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        if _all_fresh(operands):
            return cls.MIN_D_OVER_DELTA
        return _noise.required_ratio(max(_noises(operands)))

    @staticmethod
    def unsafe_apply(a: Ciphered) -> Ciphered:
        return circuits.gate_not(a)


class HomomorphicAddition(HomomorphicOperation2):
    """Ripple-carry addition.  The class constant mirrors the reference's
    published 21 (src/impls/numbers.rs:34-36); the checked API uses the
    EXACT width-aware noise bound via :meth:`requirement_for` - the
    published constant admits parameters where decryption fails on every
    secret key with a non-zero constant term (models/noise.py)."""

    MIN_D_OVER_DELTA = 21

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(_noise.add_noise_seeded(n, na, nb))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.add(a, b)


class HomomorphicMultiplication(HomomorphicOperation2):
    """Wrapping multiplication - carry-save tree circuit (0.3.x default).

    The class constant mirrors the reference's "conservative default" 64
    (src/impls/numbers.rs:47-50) - which is in fact NOT conservative even
    for the reference's own circuit (exact u8 bound: 152*delta,
    models/noise.py::mul_ref_noise_degree; measured >= 105 at delta=1),
    and that circuit's bound grows EXPONENTIALLY with width (u16: 19,348;
    u32: 4.4e8) because the accumulation multiplies carries by running
    sums.  The shipped circuit is the Dadda-style carry-save tree
    (models/csaplan.py, circuits.mul_unsigned) whose bound grows
    polynomially; the checked API validates the exact width-aware bound
    of whichever circuit runs (the reference accumulation below width 4,
    where the bounds tie): with the round-5 majority-form final ripple
    (circuits.add) the exact bounds are u8 d/delta >= 65, u16 417,
    u32 2,385, u64 13,373 - all inside the representable parameter
    space, so wide products clear the checked API (the reference circuit
    allowed only u8).  Round-4 bounds with the reference-expansion
    ripple were 149/1,013/5,873/33,377; MUL32_r05.json executed u32 at
    that older, looser envelope (d=5888), which remains valid - the new
    bound strictly widens it.  Execution status: u8/u16/u32 EXECUTED
    end-to-end on chip - encrypt, checked gate, tree circuit, decrypt,
    assert; u64 is replay-verified and execution-attempted (keygen +
    checked gate ran on chip at d=13440; the eager tree crashed the
    tunneled TPU worker - NOISE.md §4b).  Beyond-envelope
    parameters remain available via ``unsafe_apply`` (where correctness
    additionally requires a secret key with S(0) = 0 - see NOISE.md)."""

    MIN_D_OVER_DELTA = 64

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(_noise.mul_noise_seeded(n, na, nb))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        desc = a.desc
        signed = isinstance(desc, _codec.IntDescriptor) and desc.signed
        if signed:
            return circuits.mul_signed(a, b)
        return circuits.mul_unsigned(a, b)


# ---------------------------------------------------------------------------
# Extensions beyond the reference's op set (same trait machinery)
# ---------------------------------------------------------------------------


class HomomorphicSubtraction(HomomorphicOperation2):
    """Wrapping two's-complement ``a - b`` (not in the reference).

    Same circuit shape as :class:`HomomorphicAddition` (``a + ~b + 1``;
    NOT is degree-free), hence the same requirement.
    """

    MIN_D_OVER_DELTA = 21

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(
            _noise.add_noise_seeded(n, na, nb, c0=max(na, nb))
        )

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.sub(a, b)


class HomomorphicNegation(HomomorphicOperation1):
    """Wrapping two's-complement ``-a`` (not in the reference).

    The constant-operand adder specialization: strictly cheaper and
    lower-degree than a full addition, so the addition requirement is a
    safe (conservative) bound.
    """

    MIN_D_OVER_DELTA = 21

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na = operands[0].noise if operands else _FRESH
        return _noise.required_ratio(
            _noise.add_noise_seeded(n, na, na, c0=na)
        )

    @staticmethod
    def unsafe_apply(a: Ciphered) -> Ciphered:
        return circuits.neg(a)


class HomomorphicLessThan(HomomorphicOperation2):
    """``a < b`` as ``Ciphered[Bool]`` (not in the reference).

    Pairwise tree comparator (circuits._lt_tree): log-depth, exact noise
    degree ``(n+1)*(delta+1)`` for power-of-two widths - ~3x tighter than
    a borrow-chain comparison, so u8 comparisons need ``d/delta >= 19``.
    Signed (two's-complement) descriptors dispatch to the sign-bit-flipped
    circuit (degree-free, requirement unchanged) exactly as multiplication
    dispatches on ``desc.signed``.
    """

    MIN_D_OVER_DELTA = 21

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(_noise.compare_noise_seeded(n, na, nb))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.lt(a, b)


class HomomorphicGreaterThan(HomomorphicOperation2):
    """``a > b`` as ``Ciphered[Bool]`` (not in the reference);
    signedness-dispatched like :class:`HomomorphicLessThan`."""

    MIN_D_OVER_DELTA = 21

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(_noise.compare_noise_seeded(n, na, nb))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.gt(a, b)


class HomomorphicMinimum(HomomorphicOperation2):
    """``min(a, b)`` (not in the reference): borrow-chain compare + mux.

    Signedness-dispatched through :func:`circuits.lt`.  One AND deeper
    than the comparison (the mux), hence the +2 on the published-style
    class constant; the checked API uses the exact width-aware bound.
    """

    MIN_D_OVER_DELTA = 23

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(_noise.min_max_noise_seeded(n, na, nb))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.min_(a, b)


class HomomorphicMaximum(HomomorphicOperation2):
    """``max(a, b)`` (not in the reference); see :class:`HomomorphicMinimum`."""

    MIN_D_OVER_DELTA = 23

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(_noise.min_max_noise_seeded(n, na, nb))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.max_(a, b)


class HomomorphicSum(HomomorphicOperationN):
    """N-ary wrapping sum (not in the reference): the first SHIPPED
    consumer of the N-ary trait surface (the reference defines
    ``HomomorphicOperation<N, T>`` at src/operations.rs:143-213 but ships
    no N-ary op).

    Carry-save tree over the k-row bit matrix (circuits.sum_many):
    ``O(log k)`` batched compressor levels + one ripple add, with
    near-linear noise growth in ``k`` - folding binary adds replays
    astronomically higher (8 u8 operands: 186 vs ~2.0e8 at delta=1,
    models/noise.py).  The class constant covers the two-operand case
    (the adder's published 21); the checked API validates the exact
    (width, count)-aware bound through :meth:`requirement_for`.
    """

    MIN_D_OVER_DELTA = 21

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        return _noise.required_ratio(
            _noise.sum_noise_seeded(n, _noises(operands))
        )

    @staticmethod
    def unsafe_apply(args) -> Ciphered:
        return circuits.sum_many(args)


class HomomorphicPopCount(HomomorphicOperation1):
    """Population count (not in the reference): number of set bits, as
    the operand's own width.

    Carry-save reduction of the bit lanes (circuits.popcount).  Exact
    width-aware bound via :meth:`requirement_for` (u8: 31, u32: 145); the
    class constant is the all-shipped-widths-sound fallback (u128: 733).
    """

    MIN_D_OVER_DELTA = 733

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na = operands[0].noise if operands else _FRESH
        return _noise.required_ratio(_noise.popcount_noise_seeded(n, na))

    @staticmethod
    def unsafe_apply(a: Ciphered) -> Ciphered:
        return circuits.popcount(a)


class HomomorphicEquality(HomomorphicOperation2):
    """``a == b`` as a ``Ciphered[Bool]`` (not in the reference).

    Lane-wise XNOR + AND-reduction tree over ``n`` bit lanes (boolean
    degree ``n`` - XNOR lanes are affine).  Exact noise analysis: each
    fresh ciphertext's noise term ``X * sum R_i`` has degree <= delta + 1
    (keygen forces ``deg R_i = delta`` exactly), XNOR leaves it unchanged,
    and the AND tree multiplies ``n`` of them, so decryption is correct
    iff ``n * (delta + 1) < d``.  In the checked API's ``d >= r * delta``
    form, ``r = 2n + 1`` is sufficient for every ``delta >= 1``
    (``(2n+1)*delta >= n*delta + n + 1  <=>  delta*(n+1) >= n + 1``).
    :meth:`requirement_for` therefore returns ``2 * width + 1`` - width-
    aware (u8 needs 17, u128 needs 257) instead of one loose blanket.
    The class constant is the all-widths-sound fallback for callers that
    validate without operands.
    """

    MIN_D_OVER_DELTA = 2 * 128 + 1  # sound for every shipped width

    @classmethod
    def requirement_for(cls, *operands: Ciphered) -> int:
        n = max(len(c) for c in operands)
        na, nb = (_noises(operands) + [_FRESH])[:2]
        return _noise.required_ratio(_noise.eq_noise_seeded(n, na, nb))

    @staticmethod
    def unsafe_apply(a: Ciphered, b: Ciphered) -> Ciphered:
        return circuits.eq(a, b)
