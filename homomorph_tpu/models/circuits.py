"""Homomorphic boolean circuits over ciphered bit-lanes.

TPU-native re-design of the reference's circuit library (reference:
src/impls/numbers/common.rs).  Structural parity with the reference's
gate-for-gate semantics (so ``d/delta`` requirements carry over), but
vectorized TPU-first:

* Whole-tensor gates: XOR/AND/OR/NOT act on ALL bit lanes of a ``Ciphered``
  in one batched device op (the reference zips lane-by-lane,
  common.rs:5-35).
* The ripple-carry adder (common.rs:37-56) precomputes the ``a XOR b`` and
  ``a AND b`` lane tensors once, leaving only the inherently sequential
  carry recurrence - 2 batched carry-less multiplies per bit position,
  batched over any leading dims.
* The multipliers (common.rs:66-163) keep the reference's exact
  partial-product + carry bookkeeping (including the Baugh-Wooley sign
  corrections for signed mul, common.rs:124-126) with per-lane degree-class
  tracking.

Degree-class math: a fresh ciphered bit has degree bound ``B0 = d + dp``;
AND adds bounds.  The adder's carry bound grows by ``3*B0`` per bit
position, so lane ``i`` of a sum has bound ``<= 3*i*B0`` - this drives the
static limb shapes and is why "decipher after add" costs more than fresh
decipher (reference benches/u32.rs:44-49).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .. import codec as _codec
from ..cipher import Ciphered, CipheredBit
from ..gf2 import kernels as gf2k
from ..gf2 import poly as gf2

__all__ = [
    "gate_and",
    "gate_or",
    "gate_xor",
    "gate_not",
    "add",
    "add_lanes",
    "sub",
    "neg",
    "eq",
    "lt",
    "gt",
    "le",
    "ge",
    "select",
    "mul_unsigned",
    "mul_unsigned_lanes",
    "mul_signed",
    "mul_signed_lanes",
]


# --------------------------------------------------------------------------
# Whole-tensor gates (common.rs:5-35)
# --------------------------------------------------------------------------


def gate_xor(a: Ciphered, b: Ciphered) -> Ciphered:
    return Ciphered(
        gf2.xor(a.limbs, b.limbs), max(a.bound, b.bound), a.desc
    )


def gate_and(a: Ciphered, b: Ciphered) -> Ciphered:
    prod = gf2k.clmul(a.limbs, b.limbs)
    bound = a.bound + b.bound
    return Ciphered(
        gf2.fit_limbs(prod, gf2.bucket(gf2.limbs_for(bound))), bound, a.desc
    )


def gate_or(a: Ciphered, b: Ciphered) -> Ciphered:
    x = gf2.xor(a.limbs, b.limbs)
    m = gf2k.clmul(a.limbs, b.limbs)
    bound = a.bound + b.bound
    return Ciphered(
        gf2.fit_limbs(gf2.xor(x, m), gf2.bucket(gf2.limbs_for(bound))),
        bound,
        a.desc,
    )


def gate_not(a: Ciphered) -> Ciphered:
    return Ciphered(gf2.xor_const_bit(a.limbs, 1), a.bound, a.desc)


# --------------------------------------------------------------------------
# Ripple-carry adder (common.rs:37-64)
# --------------------------------------------------------------------------


def add_lanes(
    a: Sequence[CipheredBit],
    b: Sequence[CipheredBit],
    carry_in: CipheredBit | None = None,
) -> list[CipheredBit]:
    """Wrap-around ripple-carry sum of equal-length lane lists.

    Per-bit recurrence (common.rs:43-53):
      ``s_i = a_i ^ b_i ^ c``;
      ``t = (a_i ^ b_i) & c``; ``c' = t ^ (a_i & b_i & (t ^ 1))``.
    The final carry is dropped (wrapping semantics, common.rs:47-49).
    ``carry_in`` seeds the chain (default: trivial zero) - with the
    one-complemented second operand and ``carry_in = one`` this computes
    two's-complement subtraction (see :func:`sub`).
    """
    n = min(len(a), len(b))
    xs = [a[i].xor(b[i]) for i in range(n)]
    gs = [a[i].and_(b[i]) for i in range(n)]
    # c' = g ^ m*c with m = x*(g^1): polynomial-identical to the reference
    # recurrence but with one multiply on the sequential path (see add()).
    ms = [xs[i].and_(gs[i].not_()) for i in range(n)]
    carry = carry_in or CipheredBit.zero(a[0].batch_shape if n else ())
    out: list[CipheredBit] = []
    for i in range(n):
        out.append(xs[i].xor(carry))
        if i + 1 >= n:
            break
        carry = gs[i].xor(ms[i].and_(carry))
    return out


def add(a: Ciphered, b: Ciphered, carry_in: CipheredBit | None = None) -> Ciphered:
    """Homomorphic addition; output length = ``len(a)`` (common.rs:58-64).

    Produces polynomials IDENTICAL to the reference's per-bit recurrence
    ``c' = t ^ (g & (t ^ 1))`` with ``t = x & c`` (common.rs:43-53), but
    restructured for the TPU: expanding over GF(2),

        c' = t ^ g*t ^ g = g ^ (x*(g ^ 1)) * c = g ^ m*c,

    where ``m_i = x_i * (g_i ^ 1)`` depends only on the inputs.  All
    ``x_i``, ``g_i``, ``m_i`` lanes are computed as three whole-tensor
    batched ops up front; the inherently sequential carry chain then needs
    ONE carry-less multiply per bit position (the reference's formulation
    needs two on the critical path).
    """
    x_all = gate_xor(a, b)
    g_all = gate_and(a, b)
    # m = x * (g ^ 1), lane-parallel (batched over all bit positions)
    m_limbs = gf2k.clmul(x_all.limbs, gf2.xor_const_bit(g_all.limbs, 1))
    m_bound = x_all.bound + g_all.bound
    m_limbs = gf2.fit_limbs(m_limbs, gf2.bucket(gf2.limbs_for(m_bound)))

    n = len(a)
    xs = [x_all[i] for i in range(n)]
    gs = [g_all[i] for i in range(n)]
    ms = [CipheredBit(m_limbs[..., i, :], m_bound) for i in range(n)]
    carry = carry_in or CipheredBit.zero(a.batch_shape)
    out: list[CipheredBit] = []
    for i in range(n):
        out.append(xs[i].xor(carry))
        if i + 1 >= n:
            break
        carry = gs[i].xor(ms[i].and_(carry))
    return Ciphered.new_from_raw(out, a.desc)


def sub(a: Ciphered, b: Ciphered) -> Ciphered:
    """Wrapping two's-complement subtraction ``a - b`` (extension beyond
    the reference's op set): ``a + ~b + 1`` via the ripple-carry adder
    with a complemented second operand and a trivial-one carry-in.
    Identical degree growth to :func:`add` (NOT is degree-free)."""
    return add(a, gate_not(b), carry_in=CipheredBit.one(a.batch_shape))


def _adder_carry_out(a: Ciphered, b: Ciphered, carry: CipheredBit) -> CipheredBit:
    """Final carry out of the full ``len(a)``-bit ripple chain.

    Same ``c' = g ^ m*c`` recurrence as :func:`add`, run through ALL n
    positions (``add`` drops the last update for wrapping semantics)."""
    x_all = gate_xor(a, b)
    g_all = gate_and(a, b)
    m_limbs = gf2k.clmul(x_all.limbs, gf2.xor_const_bit(g_all.limbs, 1))
    m_bound = x_all.bound + g_all.bound
    m_limbs = gf2.fit_limbs(m_limbs, gf2.bucket(gf2.limbs_for(m_bound)))
    for i in range(len(a)):
        m_i = CipheredBit(m_limbs[..., i, :], m_bound)
        carry = g_all[i].xor(m_i.and_(carry))
    return carry


def _bool_out(bit: CipheredBit) -> Ciphered:
    """Wrap a single ciphered bit as ``Ciphered[Bool]`` (lanes 1..7 are
    trivial zeros; a bincode bool is one byte, bit 0 = value)."""
    res = bit.limbs[..., None, :]
    zeros = jnp.zeros(res.shape[:-2] + (7, res.shape[-1]), dtype=res.dtype)
    return Ciphered(
        jnp.concatenate([res, zeros], axis=-2), bit.bound, _codec.Bool
    )


def lt(a: Ciphered, b: Ciphered) -> Ciphered:
    """Unsigned ``a < b`` as ``Ciphered[Bool]`` (extension).

    Borrow-chain comparison: the carry out of the full-width
    ``a + ~b + 1`` is the NOT-borrow, so ``a < b = NOT carry_out``.
    For signed operands flip both sign bits first (or compare
    ``a - b < 0`` via the sum's top bit).
    """
    carry = _adder_carry_out(a, gate_not(b), CipheredBit.one(a.batch_shape))
    return _bool_out(carry.not_())


def gt(a: Ciphered, b: Ciphered) -> Ciphered:
    """Unsigned ``a > b`` as ``Ciphered[Bool]`` (extension)."""
    return lt(b, a)


def le(a: Ciphered, b: Ciphered) -> Ciphered:
    """Unsigned ``a <= b``: NOT (b < a)."""
    carry = _adder_carry_out(b, gate_not(a), CipheredBit.one(a.batch_shape))
    return _bool_out(carry)


def ge(a: Ciphered, b: Ciphered) -> Ciphered:
    """Unsigned ``a >= b``: NOT (a < b)."""
    carry = _adder_carry_out(a, gate_not(b), CipheredBit.one(a.batch_shape))
    return _bool_out(carry)


def select(cond: CipheredBit, a: Ciphered, b: Ciphered) -> Ciphered:
    """Homomorphic mux (extension): ``cond ? a : b``, lane-parallel.

    ``out_i = b_i ^ cond * (a_i ^ b_i)`` - one batched carry-less multiply
    over all lanes.  ``cond`` is a single ciphered bit (e.g. lane 0 of an
    :func:`eq`/:func:`lt` result, or a ``CipheredBit`` trivial constant).
    """
    x = gf2.xor(a.limbs, b.limbs)
    prod = gf2k.clmul(cond.limbs[..., None, :], x)
    bound = max(b.bound, cond.bound + max(a.bound, b.bound))
    out = gf2.xor(gf2.pad_limbs(b.limbs, prod.shape[-1]), prod)
    return Ciphered(
        gf2.fit_limbs(out, gf2.bucket(gf2.limbs_for(bound))), bound, a.desc
    )


def neg(a: Ciphered) -> Ciphered:
    """Wrapping two's-complement negation ``-a`` (extension): ``~a + 1``.

    Specializing the adder to the constant operand collapses the carry
    recurrence to prefix products: with ``x_i = ~a_i`` and ``c_0 = 1``,
    ``out_i = x_i ^ c_i`` and ``c_{i+1} = x_i * c_i`` - one carry-less
    multiply per bit position and no ``g``/``m`` lanes at all.
    """
    x_limbs = gf2.xor_const_bit(a.limbs, 1)
    n = len(a)
    xs = [CipheredBit(x_limbs[..., i, :], a.bound) for i in range(n)]
    carry = CipheredBit.one(a.batch_shape)
    out: list[CipheredBit] = []
    for i in range(n):
        out.append(xs[i].xor(carry))
        if i + 1 >= n:
            break
        carry = xs[i].and_(carry)
    return Ciphered.new_from_raw(out, a.desc)


def eq(a: Ciphered, b: Ciphered) -> Ciphered:
    """Homomorphic equality test (extension): ``Ciphered[Bool]`` that
    deciphers to ``a == b``.

    Circuit: lane-wise XNOR (affine - no degree growth), then a balanced
    AND-reduction tree over the lane axis.  Tree shape keeps operands
    degree-balanced (Karatsuba-friendly) and the sequential depth at
    ``log2 n``; the output degree bound is ``n * max(bound_a, bound_b)``
    regardless of shape.  Output lanes 1..7 are trivial zeros (a bincode
    bool is one byte, bit 0 = value).
    """
    xn = gf2.xor_const_bit(gf2.xor(a.limbs, b.limbs), 1)
    bound = max(a.bound, b.bound)
    cur = xn
    n = cur.shape[-2]
    while n > 1:
        half = n // 2
        lo, hi = cur[..., :half, :], cur[..., half : 2 * half, :]
        prod = gf2k.clmul(lo, hi)
        bound = bound * 2
        prod = gf2.fit_limbs(prod, gf2.bucket(gf2.limbs_for(bound)))
        if n % 2:
            odd = gf2.pad_limbs(cur[..., -1:, :], prod.shape[-1])
            prod = jnp.concatenate([prod, odd], axis=-2)
        cur = prod
        n = cur.shape[-2]
    res = cur
    zeros = jnp.zeros(res.shape[:-2] + (7, res.shape[-1]), dtype=res.dtype)
    limbs = jnp.concatenate([res, zeros], axis=-2)
    return Ciphered(limbs, bound, _codec.Bool)


# --------------------------------------------------------------------------
# Multipliers (common.rs:66-163)
# --------------------------------------------------------------------------


def _mul_accumulate(
    pp: list[list[CipheredBit]], length: int, batch: tuple[int, ...]
) -> list[CipheredBit]:
    """Column accumulation with AND-carry bookkeeping (common.rs:76-102).

    For column ``i``: XOR in the anti-diagonal partial products, pushing
    ``pp & old_accumulator`` carries for column ``i+1``; then XOR in the
    ``i*(i+1)/2`` carries produced by column ``i-1``, pushing their own
    second-order carries.  Overflow columns are dropped (wrapping,
    common.rs:67).
    """
    result = [CipheredBit.zero(batch) for _ in range(length)]
    carries: list[CipheredBit] = []
    offset = 0
    for i in range(length):
        current_length = i * (i + 1) // 2
        for j in range(i + 1):
            p = pp[j][i - j]
            if i + 1 < length:
                carries.append(p.and_(result[i]))
            result[i] = result[i].xor(p)
        for j in range(current_length):
            if i + 1 < length:
                carries.append(result[i].and_(carries[offset + j]))
            result[i] = result[i].xor(carries[offset + j])
        offset += current_length
    return result


def mul_unsigned_lanes(
    a: Sequence[CipheredBit], b: Sequence[CipheredBit]
) -> list[CipheredBit]:
    """Wrapping unsigned product of equal-length lane lists (common.rs:66-105)."""
    length = len(a)
    pp = [[a[i].and_(b[j]) for j in range(length)] for i in range(length)]
    batch = a[0].batch_shape if length else ()
    return _mul_accumulate(pp, length, batch)


def _pp_tensor(a: Ciphered, b: Ciphered) -> list[list[CipheredBit]]:
    """All n*n partial products in ONE batched carry-less multiply
    (broadcast over the two lane axes), then sliced into lanes."""
    prod = gf2k.clmul(a.limbs[..., :, None, :], b.limbs[..., None, :, :])
    bound = a.bound + b.bound
    prod = gf2.fit_limbs(prod, gf2.bucket(gf2.limbs_for(bound)))
    n = len(a)
    return [
        [CipheredBit(prod[..., i, j, :], bound) for j in range(n)] for i in range(n)
    ]


def mul_unsigned(a: Ciphered, b: Ciphered) -> Ciphered:
    pp = _pp_tensor(a, b)
    return Ciphered.new_from_raw(
        _mul_accumulate(pp, len(a), a.batch_shape), a.desc
    )


def mul_signed_lanes(
    a: Sequence[CipheredBit], b: Sequence[CipheredBit]
) -> list[CipheredBit]:
    """Wrapping signed (two's-complement) product: same accumulation with
    Baugh-Wooley sign corrections - XOR constant 1 into ``pp[0][n-1]`` and
    ``pp[n-1][0]`` before accumulation (common.rs:115-155)."""
    length = len(a)
    pp = [[a[i].and_(b[j]) for j in range(length)] for i in range(length)]
    pp[0][length - 1] = pp[0][length - 1].not_()
    pp[length - 1][0] = pp[length - 1][0].not_()
    batch = a[0].batch_shape if length else ()
    return _mul_accumulate(pp, length, batch)


def mul_signed(a: Ciphered, b: Ciphered) -> Ciphered:
    pp = _pp_tensor(a, b)
    n = len(a)
    pp[0][n - 1] = pp[0][n - 1].not_()
    pp[n - 1][0] = pp[n - 1][0].not_()
    return Ciphered.new_from_raw(
        _mul_accumulate(pp, n, a.batch_shape), a.desc
    )
