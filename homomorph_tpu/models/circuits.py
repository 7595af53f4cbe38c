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
AND adds bounds.  The adder's carry bound grows by ``B0`` per bit
position (majority x-form, round 5; the reference-expansion m-form grows
by ``3*B0``), so lane ``i`` of a sum has bound ``<= (i+1)*B0`` - this
drives the static limb shapes and is why "decipher after add" costs more
than fresh decipher (reference benches/u32.rs:44-49).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .. import codec as _codec
from ..cipher import Ciphered, CipheredBit
from ..gf2 import kernels as gf2k
from ..gf2 import poly as gf2
from . import csaplan as _csaplan

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
    "min_",
    "max_",
    "abs_",
    "clamp",
    "shl",
    "shr",
    "rotl",
    "rotr",
    "mul_unsigned",
    "mul_unsigned_lanes",
    "mul_unsigned_ref",
    "mul_signed",
    "mul_signed_lanes",
    "mul_signed_ref",
    "sum_many",
    "popcount",
]


# --------------------------------------------------------------------------
# Whole-tensor gates (common.rs:5-35)
# --------------------------------------------------------------------------


def gate_xor(a: Ciphered, b: Ciphered) -> Ciphered:
    a, b = a.densify(), b.densify()
    return Ciphered(
        gf2.xor(a.limbs, b.limbs), max(a.bound, b.bound), a.desc,
        noise=max(a.noise, b.noise),
    )


def gate_and(a: Ciphered, b: Ciphered) -> Ciphered:
    a, b = a.densify(), b.densify()
    prod = gf2k.clmul(a.limbs, b.limbs)
    bound = a.bound + b.bound
    return Ciphered(
        gf2.fit_limbs(prod, gf2.bucket(gf2.limbs_for(bound))), bound, a.desc,
        noise=a.noise + b.noise,
    )


def gate_or(a: Ciphered, b: Ciphered) -> Ciphered:
    a, b = a.densify(), b.densify()
    x = gf2.xor(a.limbs, b.limbs)
    m = gf2k.clmul(a.limbs, b.limbs)
    bound = a.bound + b.bound
    return Ciphered(
        gf2.fit_limbs(gf2.xor(x, m), gf2.bucket(gf2.limbs_for(bound))),
        bound,
        a.desc,
        noise=a.noise + b.noise,
    )


def gate_not(a: Ciphered) -> Ciphered:
    a = a.densify()
    return Ciphered(gf2.xor_const_bit(a.limbs, 1), a.bound, a.desc,
                    noise=a.noise)


# --------------------------------------------------------------------------
# Ripple-carry adder (common.rs:37-64)
# --------------------------------------------------------------------------


def add_lanes(
    a: Sequence[CipheredBit],
    b: Sequence[CipheredBit],
    carry_in: CipheredBit | None = None,
) -> list[CipheredBit]:
    """Wrap-around ripple-carry sum of equal-length lane lists.

    Boolean-equal to the reference's per-bit recurrence (common.rs:43-53)
    via the majority x-form ``c' = g ^ x*c`` with ``x = a ^ b``,
    ``g = a & b`` - see :func:`add` for the identity and why it beats
    the reference-expansion ``m``-form on degree growth and work.
    The final carry is dropped (wrapping semantics, common.rs:47-49).
    ``carry_in`` seeds the chain (default: trivial zero) - with the
    one-complemented second operand and ``carry_in = one`` this computes
    two's-complement subtraction (see :func:`sub`).
    """
    n = min(len(a), len(b))
    xs = [a[i].xor(b[i]) for i in range(n)]
    gs = [a[i].and_(b[i]) for i in range(n)]
    carry: CipheredBit | None = carry_in
    out: list[CipheredBit] = []
    for i in range(n):
        out.append(xs[i] if carry is None else xs[i].xor(carry))
        if i + 1 >= n:
            break
        # c' = g ^ x*c; with no carry yet, c' = g exactly (x * zero = 0)
        carry = gs[i] if carry is None else gs[i].xor(xs[i].and_(carry))
    return out


def add(a: Ciphered, b: Ciphered, carry_in: CipheredBit | None = None) -> Ciphered:
    """Homomorphic addition; output length = ``len(a)`` (common.rs:58-64).

    Computes the same boolean function as the reference's per-bit
    recurrence ``c' = t ^ (g & (t ^ 1))`` with ``t = x & c``
    (common.rs:43-53), via the textbook majority identity

        c' = a*b ^ (a ^ b)*c = g ^ x*c,

    an affine GF(2)[X] recurrence whose multiplier coefficient is the
    ALREADY-COMPUTED sum lane ``x = a ^ b``.  The reference's form
    expands to ``c' = g ^ m*c`` with ``m = x*(g^1)`` - boolean-equal
    (the two differ by the polynomial ``x*g*c``, which decrypts to
    ``(a^b)&(a&b)&c = 0``) but with ``deg m = max(da,db) + da + db``:
    a ~3x larger chain coefficient AND ~3x faster carry-degree growth.
    The x-form (round 5) cuts the sequential chain's clmul work ~9x,
    drops the whole-tensor ``m`` precompute multiply entirely, and
    tightens every downstream noise bound.  models/noise.py replays
    this exact recurrence, so the checked API's envelope follows the
    SHIPPED circuit; the reference's published ``MIN_D_OVER_DELTA``
    constants survive as documentation only (models/numbers.py).

    Chain shape: step ``i`` multiplies the SMALL fixed-degree ``x_i``
    by the growing carry (carry degree grows by ``deg x`` per
    position), so total chain work is ~ n^2/2 * L0^2 words.

    A blocked parallel-prefix evaluation (:func:`_affine_carry_scan`,
    enable with ``HOMOMORPH_TPU_CARRY_SCAN=1``) cuts sequential device
    stages ~3x and is polynomial-identical (the ring is commutative /
    associative), but composing affine maps squares operand degrees:
    block summaries reach ``K*deg(x)`` and the batched fill multiplies
    every position at the worst-case bound - measured ~9x MORE device
    time at production batch sizes on TPU v5e (m-form; the x-form
    shrinks its constant too but not the squaring), so the ripple is
    the default; the scan remains available for small-batch
    latency-bound regimes.
    """
    a, b = a.densify(), b.densify()
    x_all = gate_xor(a, b)
    g_all = gate_and(a, b)
    # The chain coefficient is x = a ^ b itself - no precompute multiply.
    # EXACT width, not bucketed: x is the carry chain's hot small operand
    # and the Pallas kernel's pass count is (Lb+1) - see the round-3
    # adder section of PERF.md for why exactness on the small operand is
    # free (same tensor at every step, zero extra kernel shapes).
    x_limbs = gf2.fit_limbs(x_all.limbs, gf2.limbs_for(x_all.bound))
    x_bound = x_all.bound
    x_noise = x_all.noise

    n = len(a)
    carry: CipheredBit | None = carry_in
    if _use_carry_scan() and n >= 16:
        carries = _affine_carry_scan(
            g_all.limbs[..., : n - 1, :],
            g_all.bound,
            x_limbs[..., : n - 1, :],
            x_bound,
            carry if carry is not None else CipheredBit.zero(a.batch_shape),
            g_noise=g_all.noise,
            m_noise=x_noise,
        )
        out = [x_all[i].xor(c) for i, c in enumerate(carries)]
        return Ciphered.new_from_raw(out, a.desc)

    xs = [x_all[i] for i in range(n)]
    gs = [g_all[i] for i in range(n)]
    out: list[CipheredBit] = []
    for i in range(n):
        out.append(xs[i] if carry is None else xs[i].xor(carry))
        if i + 1 >= n:
            break
        if carry is None:
            # first step: c' = g exactly (x * zero = 0) - one fewer
            # sequential clmul and the exact tracked noise
            carry = gs[i]
            continue
        # c' = g ^ x*c.  The carry stays degree-class bucketed (fully
        # exact widths would give ~31 distinct Mosaic kernel shapes per
        # chain - measured minutes of one-time compile on this host for a
        # ~7-14% row-extent saving); the x operand above is exact because
        # it is the same small tensor at EVERY step, so exactness there
        # costs zero extra kernels and saves passes.
        prod = gf2k.clmul(x_limbs[..., i, :], carry.limbs)
        nb = max(g_all.bound, x_bound + carry.bound)
        nn = max(g_all.noise, x_noise + carry.noise)
        Lc = gf2.bucket(gf2.limbs_for(nb))
        carry = CipheredBit(
            gf2.xor(gf2.fit_limbs(prod, Lc), gs[i].limbs), nb, noise=nn
        )
    return Ciphered.new_from_raw(out, a.desc)


_SCAN_BLOCK = 8  # carry-scan block size (sequential stages ~ 2*log2(K) + n/K)


# Snapshotted ONCE at import: the knob is read at trace time and is not part
# of any jit cache key, so flipping the env var after a circuit has been
# traced would silently have no effect on already-compiled functions.  A
# single import-time snapshot makes the semantics explicit: set
# HOMOMORPH_TPU_CARRY_SCAN=1 before importing homomorph_tpu.
_CARRY_SCAN = os.environ.get("HOMOMORPH_TPU_CARRY_SCAN", "0") == "1"


def _use_carry_scan() -> bool:
    """Opt-in knob for the prefix-scan carry evaluation (see :func:`add`).
    Import-time snapshot; see ``_CARRY_SCAN`` above."""
    return _CARRY_SCAN


def _affine_carry_scan(
    g: "jnp.ndarray",
    g_bound: int,
    m: "jnp.ndarray",
    m_bound: int,
    carry0: CipheredBit,
    g_noise: int = 4,
    m_noise: int = 6,
) -> list[CipheredBit]:
    """All carries of ``c_{p+1} = g_p ^ m_p * c_p`` via a blocked prefix scan.

    ``g``/``m``: [..., P, L] lane tensors for positions 0..P-1; returns the
    P+1 carries ``c_0..c_P`` as :class:`CipheredBit` lanes.  Three phases,
    all expressed on the position axis so the clmul batch is B*P (vs B for
    the ripple), which fills the Pallas kernel's 128-wide lane axis:

    1. *Intra-block inclusive scan* (Hillis-Steele, log2(K) rounds of 2
       batched clmuls): position p ends up holding the composition of the
       affine maps from its block start through p.
    2. *Block chain* (ceil(P/K) sequential steps): carry at each block
       boundary via the block-summary maps.
    3. *Fill* (1 batched clmul): every interior carry is
       ``Gpref ^ Mpref * C_block``, batched over all blocks and offsets.

    Affine-map composition: (G2, M2) after (G1, M1) is
    ``(G2 ^ M2*G1, M2*M1)`` - associativity of GF(2)[X] makes the
    regrouping exact, so the outputs are polynomial-identical to the
    ripple evaluation (and to the reference's recurrence, common.rs:43-53).
    """
    P = g.shape[-2]
    K = _SCAN_BLOCK
    Gp, gb, gn = g, g_bound, g_noise
    Mp, mb, mn = m, m_bound, m_noise

    # -- phase 1: segmented Hillis-Steele scan over each K-block -----------
    r = 1
    while r < min(K, P):
        ps = np.array([p for p in range(P) if (p % K) >= r], dtype=np.int32)
        if ps.size == 0:
            break
        prev = ps - r
        G_at = jnp.take(Gp, jnp.asarray(ps), axis=-2)
        M_at = jnp.take(Mp, jnp.asarray(ps), axis=-2)
        G_pv = jnp.take(Gp, jnp.asarray(prev), axis=-2)
        M_pv = jnp.take(Mp, jnp.asarray(prev), axis=-2)
        new_gb = gb + mb
        new_mb = 2 * mb
        new_gn = gn + mn
        new_mn = 2 * mn
        Gn = gf2.xor(G_at, gf2k.clmul(M_at, G_pv))
        Mn = gf2k.clmul(M_at, M_pv)
        Lg = gf2.bucket(gf2.limbs_for(new_gb))
        Lm = gf2.bucket(gf2.limbs_for(new_mb))
        # scatter back at static indices; untouched rows keep old values
        Gp = gf2.pad_limbs(Gp, Lg).at[..., jnp.asarray(ps), :].set(
            gf2.fit_limbs(Gn, Lg)
        )
        Mp = gf2.pad_limbs(Mp, Lm).at[..., jnp.asarray(ps), :].set(
            gf2.fit_limbs(Mn, Lm)
        )
        gb, mb = new_gb, new_mb
        gn, mn = new_gn, new_mn
        r *= 2

    # -- phase 2: sequential chain over block summaries ---------------------
    n_blocks = -(-P // K)
    # When P is a multiple of K, carry c_P is itself a block-entry carry
    # (t == 0 below) and needs one extra chain step.
    n_chain = n_blocks - 1 + (1 if P % K == 0 else 0)
    Cs: list[CipheredBit] = [carry0]  # carry entering each block
    for b in range(n_chain):
        e = (b + 1) * K - 1  # last position of block b
        Gb = CipheredBit(Gp[..., e, :], gb, noise=gn)
        Mb = CipheredBit(Mp[..., e, :], mb, noise=mn)
        Cs.append(Gb.xor(Mb.and_(Cs[-1])))

    # -- phase 3: batched fill of interior carries --------------------------
    # c_{bK+t} for t in 1..K (t=K only matters for the next block start,
    # already computed above; interior needs t in 1..K-1 plus the final
    # partial block).  Gather prefix maps at positions bK..bK+K-2 and
    # multiply by the block-entry carry, batched over (blocks, offsets).
    entry = Cs[:n_blocks]  # block-entry carries only (exit carry feeds p=P)
    Lc = max(c.num_limbs for c in entry)
    C_stack = jnp.stack([c.pad_to(Lc).limbs for c in entry], axis=-2)  # [..., nb, Lc]
    cb = max(c.bound for c in entry)
    cn = max(c.noise for c in entry)

    pos = np.arange(n_blocks * K).reshape(n_blocks, K)[:, : K - 1]  # [nb, K-1]
    pos = np.minimum(pos, P - 1)  # clamp tail (duplicates are discarded)
    Gsel = jnp.take(Gp, jnp.asarray(pos.reshape(-1)), axis=-2)
    Msel = jnp.take(Mp, jnp.asarray(pos.reshape(-1)), axis=-2)
    lead = Gsel.shape[:-2]
    Gsel = Gsel.reshape(lead + (n_blocks, K - 1, Gsel.shape[-1]))
    Msel = Msel.reshape(lead + (n_blocks, K - 1, Msel.shape[-1]))
    prod = gf2k.clmul(Msel, C_stack[..., :, None, :])  # [..., nb, K-1, *]
    fill = gf2.xor(Gsel, prod)
    fill_bound = max(gb, mb + cb)
    fill_noise = max(gn, mn + cn)
    Lf = gf2.bucket(gf2.limbs_for(fill_bound))
    fill = gf2.fit_limbs(fill, Lf)

    out: list[CipheredBit] = []
    for p in range(P + 1):
        b, t = divmod(p, K)
        if t == 0:
            out.append(Cs[b])
        else:
            out.append(
                CipheredBit(fill[..., b, t - 1, :], fill_bound,
                            noise=fill_noise)
            )
    return out


def sub(a: Ciphered, b: Ciphered) -> Ciphered:
    """Wrapping two's-complement subtraction ``a - b`` (extension beyond
    the reference's op set): ``a + ~b + 1`` via the ripple-carry adder
    with a complemented second operand and a trivial-one carry-in.
    Identical degree growth to :func:`add` (NOT is degree-free)."""
    return add(a, gate_not(b), carry_in=CipheredBit.one(a.batch_shape))


def _adder_carry_out(a: Ciphered, b: Ciphered, carry: CipheredBit) -> CipheredBit:
    """Final carry out of the full ``len(a)``-bit ripple chain.

    Same ``c' = g ^ x*c`` recurrence as :func:`add`, run through ALL n
    positions (``add`` drops the last update for wrapping semantics).
    The comparison circuits used this (``a < b = NOT carry_out(a + ~b + 1)``)
    before the tree comparator (:func:`_lt_tree`) replaced it with a
    log-depth, lower-noise circuit; kept as the independent semantic
    oracle the tree is tested against (tests/test_round3.py)."""
    x_all = gate_xor(a, b)
    g_all = gate_and(a, b)
    # exact-width x, bucketed carry - see add() for the rationale
    x_limbs = gf2.fit_limbs(x_all.limbs, gf2.limbs_for(x_all.bound))
    x_bound = x_all.bound
    x_noise = x_all.noise
    for i in range(len(a)):
        prod = gf2k.clmul(x_limbs[..., i, :], carry.limbs)
        nb = max(g_all.bound, x_bound + carry.bound)
        nn = max(g_all.noise, x_noise + carry.noise)
        Lc = gf2.bucket(gf2.limbs_for(nb))
        carry = CipheredBit(
            gf2.xor(gf2.fit_limbs(prod, Lc), g_all[i].limbs), nb, noise=nn
        )
    return carry


def _bool_out(bit: CipheredBit) -> Ciphered:
    """Wrap a single ciphered bit as ``Ciphered[Bool]``.

    Lanes 1..7 of a bincode bool byte are trivial zeros; they are kept
    IMPLICIT (``zero_lanes=7``) so only lane 0 is stored - decipher-after-
    compare reads 1/8 the bytes of a dense layout (the degree-trimmed
    storage discipline of src/polynomial.rs:404-426, on the lane axis)."""
    return Ciphered(bit.limbs[..., None, :], bit.bound, _codec.Bool,
                    zero_lanes=7, noise=bit.noise)


def _is_signed(c: Ciphered) -> bool:
    return isinstance(c.desc, _codec.IntDescriptor) and c.desc.signed


def _map_to_unsigned_order(a: Ciphered, b: Ciphered) -> tuple[Ciphered, Ciphered]:
    """Order-preserving map from two's-complement to unsigned comparisons.

    Flipping the sign bit is the classic monotone bijection
    ``x -> x ^ 2^(n-1)`` (two's-complement order becomes unsigned order);
    homomorphically it is one XOR with the trivial one() on the top lane -
    degree-free, so the comparison requirement is unchanged.  Dispatched
    when EITHER operand descriptor is a signed integer (reference
    semantics: src/impls/numbers/int.rs two's-complement ops)."""
    if not (_is_signed(a) or _is_signed(b)):
        return a, b
    return _flip_top_bit(a), _flip_top_bit(b)


def _flip_top_bit(c: Ciphered) -> Ciphered:
    top = gf2.xor_const_bit(c.limbs[..., -1:, :], 1)
    return Ciphered(
        jnp.concatenate([c.limbs[..., :-1, :], top], axis=-2), c.bound, c.desc,
        noise=c.noise,
    )


def _lt_tree(a: Ciphered, b: Ciphered) -> CipheredBit:
    """Unsigned ``a < b`` by pairwise tree reduction (log-depth).

    Per-lane seeds: ``lt_i = ~a_i * b_i`` (one batched clmul) and
    ``eq_i = a_i XNOR b_i`` (affine).  Merge rule for a high/low split:

        lt' = lt_hi ^ eq_hi * lt_lo        (the OR of DISJOINT events -
        eq' = eq_hi * eq_lo                 hi parts differing forces
                                            eq_hi = 0 - so OR == XOR)

    vs the borrow chain: sequential depth log2(n) instead of n, TWO wide
    batched clmuls per level instead of one narrow clmul per bit, and the
    worst-case noise degree drops from ~3n*(delta+1) to (n+1)*(delta+1)
    (models/noise.py::compare_noise_degree) - so u8 comparisons need
    d/delta >= 19 instead of 49.  Odd lane counts pass the leftover lane
    through to the next level.
    """
    # lane seeds
    na = gf2.xor_const_bit(a.limbs, 1)
    lt_l = gf2k.clmul(na, b.limbs)  # [..., n, 2L]
    lt_b = a.bound + b.bound
    lt_n = a.noise + b.noise
    lt_l = gf2.fit_limbs(lt_l, gf2.bucket(gf2.limbs_for(lt_b)))
    eq_l = gf2.xor_const_bit(gf2.xor(a.limbs, b.limbs), 1)
    eq_b = max(a.bound, b.bound)
    eq_n = max(a.noise, b.noise)

    n = lt_l.shape[-2]
    while n > 1:
        half = n // 2
        # lanes are LSB-first: pair (lo=2j, hi=2j+1) keeps significance order
        lt_lo, lt_hi = lt_l[..., 0::2, :][..., :half, :], lt_l[..., 1::2, :]
        eq_lo, eq_hi = eq_l[..., 0::2, :][..., :half, :], eq_l[..., 1::2, :]
        prod = gf2k.clmul(eq_hi, lt_lo)
        new_lt_b = max(lt_b, eq_b + lt_b)
        new_lt_n = max(lt_n, eq_n + lt_n)
        Ll = gf2.bucket(gf2.limbs_for(new_lt_b))
        lt_new = gf2.fit_limbs(
            gf2.xor(gf2.pad_limbs(lt_hi, prod.shape[-1]), prod), Ll
        )
        eq_new = gf2k.clmul(eq_hi, eq_lo)
        new_eq_b = 2 * eq_b
        new_eq_n = 2 * eq_n
        eq_new = gf2.fit_limbs(eq_new, gf2.bucket(gf2.limbs_for(new_eq_b)))
        if n % 2:  # leftover (most-significant) lane passes through
            odd_lt = gf2.pad_limbs(lt_l[..., -1:, :], lt_new.shape[-1])
            odd_eq = gf2.pad_limbs(eq_l[..., -1:, :], eq_new.shape[-1])
            lt_new = jnp.concatenate([lt_new, odd_lt], axis=-2)
            eq_new = jnp.concatenate([eq_new, odd_eq], axis=-2)
        lt_l, eq_l = lt_new, eq_new
        lt_b, eq_b = new_lt_b, new_eq_b
        lt_n, eq_n = new_lt_n, new_eq_n
        n = lt_l.shape[-2]
    return CipheredBit(lt_l[..., 0, :], lt_b, noise=lt_n)


def lt(a: Ciphered, b: Ciphered) -> Ciphered:
    """``a < b`` as ``Ciphered[Bool]`` (extension).

    Tree comparison (see :func:`_lt_tree`); signed (two's-complement)
    operands are dispatched on the descriptor: both sign bits are flipped
    first (degree-free), then the unsigned tree runs unchanged.
    """
    a, b = _map_to_unsigned_order(a.densify(), b.densify())
    return _bool_out(_lt_tree(a, b))


def gt(a: Ciphered, b: Ciphered) -> Ciphered:
    """``a > b`` as ``Ciphered[Bool]`` (extension); signedness-dispatched."""
    return lt(b, a)


def le(a: Ciphered, b: Ciphered) -> Ciphered:
    """``a <= b``: NOT (b < a); signedness-dispatched."""
    a, b = _map_to_unsigned_order(a.densify(), b.densify())
    return _bool_out(_lt_tree(b, a).not_())


def ge(a: Ciphered, b: Ciphered) -> Ciphered:
    """``a >= b``: NOT (a < b); signedness-dispatched."""
    a, b = _map_to_unsigned_order(a.densify(), b.densify())
    return _bool_out(_lt_tree(a, b).not_())


def select(cond: CipheredBit, a: Ciphered, b: Ciphered) -> Ciphered:
    """Homomorphic mux (extension): ``cond ? a : b``, lane-parallel.

    ``out_i = b_i ^ cond * (a_i ^ b_i)`` - one batched carry-less multiply
    over all lanes.  ``cond`` is a single ciphered bit (e.g. lane 0 of an
    :func:`eq`/:func:`lt` result, or a ``CipheredBit`` trivial constant).
    """
    a, b = a.densify(), b.densify()
    x = gf2.xor(a.limbs, b.limbs)
    prod = gf2k.clmul(cond.limbs[..., None, :], x)
    bound = max(b.bound, cond.bound + max(a.bound, b.bound))
    noise = max(b.noise, cond.noise + max(a.noise, b.noise))
    out = gf2.xor(gf2.pad_limbs(b.limbs, prod.shape[-1]), prod)
    return Ciphered(
        gf2.fit_limbs(out, gf2.bucket(gf2.limbs_for(bound))), bound, a.desc,
        noise=noise,
    )


def min_(a: Ciphered, b: Ciphered) -> Ciphered:
    """Homomorphic minimum (extension): ``a < b ? a : b``.

    One borrow-chain comparison + one mux; signedness-dispatched through
    :func:`lt`.  Noise degree = compare + one fresh factor (the mux's
    single AND) - see ``models.noise.min_max_noise_degree``.
    """
    a, b = a.densify(), b.densify()
    c = lt(a, b)
    return select(c[0], a, b)


def max_(a: Ciphered, b: Ciphered) -> Ciphered:
    """Homomorphic maximum (extension): ``a < b ? b : a``."""
    a, b = a.densify(), b.densify()
    c = lt(a, b)
    return select(c[0], b, a)


def abs_(a: Ciphered) -> Ciphered:
    """Homomorphic absolute value of a signed integer (extension).

    ``sign ? -a : a`` - the sign lane muxes the negation.  Wrapping
    semantics at the type minimum (``abs(i8 -128) = -128``), like Rust's
    ``wrapping_abs``.  Noise degree: ``max(deg -a, D0 + deg -a)`` with
    the negation's prefix-product degree - bounded by the subtraction
    requirement, which :class:`~.numbers.HomomorphicNegation` shares.
    """
    a = a.densify()
    return select(a[len(a) - 1], neg(a), a)


def clamp(a: Ciphered, lo: Ciphered, hi: Ciphered) -> Ciphered:
    """Homomorphic ``min(max(a, lo), hi)`` (extension); signedness follows
    the descriptors through the tree comparator."""
    return min_(max_(a, lo), hi)


def _zero_lanes_like(a: Ciphered, k: int) -> "jnp.ndarray":
    return jnp.zeros(a.limbs.shape[:-2] + (k, a.limbs.shape[-1]), a.limbs.dtype)


def shl(a: Ciphered, k: int) -> Ciphered:
    """Logical shift left by a PLAINTEXT ``k`` (extension): ``a << k``.

    Pure lane remapping - bit lane ``i`` of the result is lane ``i - k``
    of the input, the bottom ``k`` lanes become trivial zeros.  Degree-free
    (no gate runs), like Rust's wrapping ``<<`` the top ``k`` lanes drop.
    """
    a = a.densify()
    n = len(a)
    if not 0 <= k:
        raise ValueError("shift amount must be non-negative")
    if k == 0:
        return a
    if k >= n:
        return Ciphered(_zero_lanes_like(a, n), 0, a.desc, noise=0)
    out = jnp.concatenate(
        [_zero_lanes_like(a, k), a.limbs[..., : n - k, :]], axis=-2
    )
    return Ciphered(out, a.bound, a.desc, noise=a.noise)


def shr(a: Ciphered, k: int, *, arithmetic: bool | None = None) -> Ciphered:
    """Shift right by a PLAINTEXT ``k`` (extension): ``a >> k``.

    Logical for unsigned descriptors, arithmetic (sign-replicating) for
    signed ones - Rust's ``>>`` semantics - unless overridden with
    ``arithmetic=``.  Degree-free lane remapping (the replicated sign lane
    is a copy, not a gate).
    """
    a = a.densify()
    n = len(a)
    if not 0 <= k:
        raise ValueError("shift amount must be non-negative")
    if arithmetic is None:
        arithmetic = _is_signed(a)
    if k == 0:
        return a
    kk = min(k, n)
    if arithmetic:
        sign = a.limbs[..., n - 1 : n, :]
        fill = jnp.broadcast_to(sign, sign.shape[:-2] + (kk,) + sign.shape[-1:])
        bound = a.bound
    else:
        fill = _zero_lanes_like(a, kk)
        bound = a.bound if kk < n else 0
    out = jnp.concatenate([a.limbs[..., kk:, :], fill], axis=-2)
    return Ciphered(out, bound, a.desc,
                    noise=a.noise if bound or arithmetic else 0)


def rotl(a: Ciphered, k: int) -> Ciphered:
    """Rotate left by a PLAINTEXT ``k`` (extension) - degree-free."""
    a = a.densify()
    n = len(a)
    k %= n
    if k == 0:
        return a
    out = jnp.concatenate(
        [a.limbs[..., n - k :, :], a.limbs[..., : n - k, :]], axis=-2
    )
    return Ciphered(out, a.bound, a.desc, noise=a.noise)


def rotr(a: Ciphered, k: int) -> Ciphered:
    """Rotate right by a PLAINTEXT ``k`` (extension) - degree-free."""
    return rotl(a, -k)


def neg(a: Ciphered) -> Ciphered:
    """Wrapping two's-complement negation ``-a`` (extension): ``~a + 1``.

    Specializing the adder to the constant operand collapses the carry
    recurrence to prefix products: with ``x_i = ~a_i`` and ``c_0 = 1``,
    ``out_i = x_i ^ c_i`` and ``c_{i+1} = x_i * c_i`` - one carry-less
    multiply per bit position and no ``g``/``m`` lanes at all.
    """
    a = a.densify()
    x_limbs = gf2.xor_const_bit(a.limbs, 1)
    n = len(a)
    xs = [CipheredBit(x_limbs[..., i, :], a.bound, noise=a.noise)
          for i in range(n)]
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
    a, b = a.densify(), b.densify()
    xn = gf2.xor_const_bit(gf2.xor(a.limbs, b.limbs), 1)
    bound = max(a.bound, b.bound)
    noise = max(a.noise, b.noise)
    cur = xn
    n = cur.shape[-2]
    while n > 1:
        half = n // 2
        lo, hi = cur[..., :half, :], cur[..., half : 2 * half, :]
        prod = gf2k.clmul(lo, hi)
        bound = bound * 2
        noise = noise * 2
        prod = gf2.fit_limbs(prod, gf2.bucket(gf2.limbs_for(bound)))
        if n % 2:
            odd = gf2.pad_limbs(cur[..., -1:, :], prod.shape[-1])
            prod = jnp.concatenate([prod, odd], axis=-2)
        cur = prod
        n = cur.shape[-2]
    return _bool_out(CipheredBit(cur[..., 0, :], bound, noise=noise))


# --------------------------------------------------------------------------
# Multipliers
#
# Default: carry-save (Dadda) tree - a TPU-native redesign (see
# models/csaplan.py).  The reference's sequential column accumulation
# (common.rs:66-163) is kept verbatim as ``mul_unsigned_ref``/
# ``mul_signed_ref``: it is the parity oracle the tree is tested against,
# and the tighter circuit below the tree's crossover width.
# --------------------------------------------------------------------------


def _batched_clmul_pairs(
    pairs: "list[tuple[CipheredBit, CipheredBit, object]]",
) -> "dict[object, CipheredBit]":
    """Evaluate many independent carry-less multiplies in few dispatches.

    Pairs are grouped by their (exact) operand limb widths; each group
    stacks into ONE batched clmul.  Product bits keep their own exact
    bounds (widths inside a group may share padding, bounds never merge).
    Results are NOT degree-class fitted - callers fit after any XOR
    assembly so trivial re-pads aren't paid twice.
    """
    out: dict[object, CipheredBit] = {}
    groups: dict[tuple[int, int], list[tuple[CipheredBit, CipheredBit, object]]] = {}
    for u, v, key in pairs:
        groups.setdefault((u.num_limbs, v.num_limbs), []).append((u, v, key))
    for items in groups.values():
        if len(items) == 1:
            u, v, key = items[0]
            out[key] = CipheredBit(gf2k.clmul(u.limbs, v.limbs),
                                   u.bound + v.bound, noise=u.noise + v.noise)
            continue
        U = jnp.stack([u.limbs for u, _, _ in items], axis=-2)
        V = jnp.stack([v.limbs for _, v, _ in items], axis=-2)
        P = gf2k.clmul(U, V)
        for idx, (u, v, key) in enumerate(items):
            out[key] = CipheredBit(P[..., idx, :], u.bound + v.bound,
                                   noise=u.noise + v.noise)
    return out


def _fit_bit(bit: CipheredBit, *, bucketed: bool = True) -> CipheredBit:
    """Trim/pad a product bit to its bound's limb count (bucketed by
    default - the degree-class discipline of CipheredBit.and_)."""
    L = gf2.limbs_for(bit.bound)
    if bucketed:
        L = gf2.bucket(L)
    return CipheredBit(gf2.fit_limbs(bit.limbs, L), bit.bound, noise=bit.noise)


def _csa_accumulate(
    bits: "dict[int, CipheredBit]",
    plan: "_csaplan.CsaPlan",
    batch: tuple[int, ...],
) -> list[CipheredBit]:
    """Run a static carry-save plan (models/csaplan.py) on live bits.

    Each level's compressor products execute as (typically) one stacked
    clmul; sums are pure XORs that XLA fuses.  Compressors whose carry
    falls off column ``n-1`` (wrapping) skip their products entirely -
    only the affine sum survives.  Finishes with the two-row ripple add.

    Memory discipline (round 4): dead intermediates are DROPPED as soon
    as no later level (or the final ripple) references them - derived
    statically from the plan.  Without this, eager execution of the u32
    multiplier holds every historical bit id alive (gigabytes at its
    100k+-limb late levels) and OOMs the chip.
    ``HOMOMORPH_TPU_EAGER_SYNC=1`` additionally blocks after any level
    whose outputs exceed 8192 limbs, bounding the async dispatch queue's
    buffer pile-up on giant circuits.
    """
    # liveness: ids needed at or after each level (scan backwards)
    final_ids = {c[i] for c in plan.final_cols for i in range(min(2, len(c)))}
    live_after: list[set] = [set(final_ids)]
    for level in reversed(plan.levels):
        needed = set(live_after[0])
        for op in level:
            needed.add(op.x)
            needed.add(op.y)
            if op.z is not None:
                needed.add(op.z)
        live_after.insert(0, needed)
    sync = os.environ.get("HOMOMORPH_TPU_EAGER_SYNC", "0") == "1"

    for li, level in enumerate(plan.levels):
        pairs: list[tuple[CipheredBit, CipheredBit, object]] = []
        for op in level:
            x, y = bits[op.x], bits[op.y]
            if op.z is None:  # half adder
                bits[op.sum] = x.xor(y)
                if op.carry is not None:
                    pairs.append((x, y, op.carry))
            else:  # full adder: sum = x^y^z, carry = x*y ^ (x^y)*z
                xy = x.xor(y)
                bits[op.sum] = xy.xor(bits[op.z])
                if op.carry is not None:
                    pairs.append((x, y, ("p1", op.carry)))
                    pairs.append((xy, bits[op.z], ("p2", op.carry)))
        prods = _batched_clmul_pairs(pairs)
        for op in level:
            if op.carry is None:
                continue
            if op.z is None:
                bits[op.carry] = _fit_bit(prods[op.carry])
            else:
                p1, p2 = prods[("p1", op.carry)], prods[("p2", op.carry)]
                carry = CipheredBit(
                    gf2.xor(p1.limbs, p2.limbs), max(p1.bound, p2.bound),
                    noise=max(p1.noise, p2.noise),
                )
                bits[op.carry] = _fit_bit(carry)
        del prods, pairs
        # drop everything the remaining levels + final ripple don't read
        keep = live_after[li + 1]
        for bid in [k for k in bits if k not in keep]:
            del bits[bid]
        if sync and any(
            bits[op.sum].num_limbs > 8192 for op in level if op.sum in bits
        ):
            import jax

            jax.block_until_ready(
                [bits[op.sum].limbs for op in level if op.sum in bits]
            )
    A = [bits[c[0]] if len(c) > 0 else None for c in plan.final_cols]
    B = [bits[c[1]] if len(c) > 1 else None for c in plan.final_cols]
    return _ripple_add_rows(A, B, batch)


def _ripple_add_rows(
    A: "list[CipheredBit | None]",
    B: "list[CipheredBit | None]",
    batch: tuple[int, ...],
) -> list[CipheredBit]:
    """Wrapping ripple-carry sum of two per-lane-bounded rows.

    Same majority recurrence as :func:`add` (``c' = g ^ x*c`` with the
    sum lane ``x = a ^ b`` as the chain coefficient - round 5; see
    :func:`add` for why this beats the reference-expansion ``m``-form
    ~9x on chain work and noise), but lanes carry heterogeneous exact
    bounds (tree levels leave low columns far below high ones), so the
    ``g`` precomputes batch through :func:`_batched_clmul_pairs` instead
    of one uniform-width tensor.

    ``None`` lanes are trivial zeros and are PRUNED exactly: a
    single-row column has ``g = a*0 = 0`` (no product launched, no
    ``max(g, .)`` in the carry bound) and its chain step is the bare
    multiply ``c' = x*c``; an empty column zeroes the carry outright.
    Roughly half the multiplier plan's final columns are single-row, so
    this prunes both work and the noise replay's bound
    (models/noise.py::_replay_csa mirrors the same rules).
    """
    n = len(A)
    zero = CipheredBit.zero(batch)
    xs: list[CipheredBit | None] = []
    gpairs: list[tuple[CipheredBit, CipheredBit, object]] = []
    for i in range(n):
        a_i, b_i = A[i], B[i]
        if a_i is None and b_i is not None:
            a_i, b_i = b_i, a_i
        if a_i is None:
            xs.append(None)
        elif b_i is None:
            xs.append(a_i)
        else:
            xs.append(a_i.xor(b_i))
            if i + 1 < n:
                gpairs.append((a_i, b_i, i))
    gp = _batched_clmul_pairs(gpairs)
    gs = {i: _fit_bit(p) for i, p in gp.items()}  # two-row columns only
    out: list[CipheredBit] = []
    carry: CipheredBit | None = None
    for i in range(n):
        x_i = xs[i]
        if x_i is None:
            out.append(carry if carry is not None else zero)
        else:
            out.append(x_i if carry is None else x_i.xor(carry))
        if i + 1 >= n:
            break
        if x_i is None:
            # empty column: c' = g ^ x*c = 0 (carry cannot propagate)
            carry = None
        elif carry is None:
            carry = gs.get(i)  # c' = g (None for single-row columns)
        else:
            prod = gf2k.clmul(x_i.limbs, carry.limbs)
            g_i = gs.get(i)
            if g_i is None:
                nb = x_i.bound + carry.bound
                nn = x_i.noise + carry.noise
                Lc = gf2.bucket(gf2.limbs_for(nb))
                carry = CipheredBit(gf2.fit_limbs(prod, Lc), nb, noise=nn)
            else:
                nb = max(g_i.bound, x_i.bound + carry.bound)
                nn = max(g_i.noise, x_i.noise + carry.noise)
                Lc = gf2.bucket(gf2.limbs_for(nb))
                carry = CipheredBit(
                    gf2.xor(gf2.fit_limbs(prod, Lc), g_i.limbs),
                    nb,
                    noise=nn,
                )
    return out


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


def _pp_bits(
    pp: "list[list[CipheredBit]]", n: int
) -> "dict[int, CipheredBit]":
    """Index the wrapping-relevant partial products (i + j < n) by the
    static plan's bit ids (models/csaplan.py: pp[i][j] -> i*n + j)."""
    return {i * n + j: pp[i][j] for i in range(n) for j in range(n - i)}


def _pp_lanes(
    a: Sequence[CipheredBit], b: Sequence[CipheredBit], length: int
) -> "list[list[CipheredBit | None]]":
    """The wrapping-relevant partial products (i + j < length) of two
    lane lists, batched through :func:`_batched_clmul_pairs` - one
    grouped clmul dispatch per distinct limb-count pair instead of
    ~n^2/2 separate ``and_`` dispatches.  Entries with i + j >= length
    wrap away and are never computed (None)."""
    pairs = [
        (a[i], b[j], (i, j))
        for i in range(length)
        for j in range(length - i)
    ]
    prods = _batched_clmul_pairs(pairs)
    pp: list[list[CipheredBit | None]] = [
        [None] * length for _ in range(length)
    ]
    for key, p in prods.items():
        i, j = key
        pp[i][j] = _fit_bit(p)
    return pp


def mul_unsigned_lanes(
    a: Sequence[CipheredBit], b: Sequence[CipheredBit]
) -> list[CipheredBit]:
    """Wrapping unsigned product of equal-length lane lists.

    Carry-save tree at ``TREE_MIN_WIDTH`` and above, the reference column
    accumulation (common.rs:66-105) below it - the same dispatch as
    :func:`mul_unsigned` (and models/noise.py), on the lane-list extension
    surface (src/cipher.rs:253-259 Deref semantics).
    """
    length = len(a)
    pp = _pp_lanes(a, b, length)
    batch = a[0].batch_shape if length else ()
    if length >= _csaplan.TREE_MIN_WIDTH:
        return _csa_accumulate(_pp_bits(pp, length), _csaplan.csa_plan(length), batch)
    return _mul_accumulate(pp, length, batch)


def _pp_tensor(a: Ciphered, b: Ciphered) -> list[list[CipheredBit]]:
    """All n*n partial products in ONE batched carry-less multiply
    (broadcast over the two lane axes), then sliced into lanes.

    EXACT width, not bucketed: like the adder's ``m`` operand, the pp
    lanes are the hot small operands of every accumulation-step clmul and
    all share ONE tensor, so exactness costs no extra kernel shapes while
    cutting the kernel's per-plane pass count (see add())."""
    a, b = a.densify(), b.densify()
    prod = gf2k.clmul(a.limbs[..., :, None, :], b.limbs[..., None, :, :])
    bound = a.bound + b.bound
    noise = a.noise + b.noise
    prod = gf2.fit_limbs(prod, gf2.limbs_for(bound))
    n = len(a)
    return [
        [CipheredBit(prod[..., i, j, :], bound, noise=noise) for j in range(n)]
        for i in range(n)
    ]


def mul_unsigned(a: Ciphered, b: Ciphered) -> Ciphered:
    """Wrapping unsigned product - carry-save tree default.

    At ``TREE_MIN_WIDTH`` (4) and above: the Dadda-style tree
    (models/csaplan.py) - ``O(log n)`` batched compressor levels + one
    two-row ripple add, far less clmul work than the reference column
    accumulation and polynomial (vs exponential) noise growth, so
    u16..u64 products clear the checked API at representable ``d``
    (models/noise.py::mul_noise_degree).  Below the crossover the
    bounds tie and the reference circuit runs instead
    (:func:`mul_unsigned_ref`).
    """
    n = len(a)
    if n < _csaplan.TREE_MIN_WIDTH:
        return mul_unsigned_ref(a, b)
    pp = _pp_tensor(a, b)
    return Ciphered.new_from_raw(
        _csa_accumulate(_pp_bits(pp, n), _csaplan.csa_plan(n), a.batch_shape), a.desc
    )


def mul_unsigned_ref(a: Ciphered, b: Ciphered) -> Ciphered:
    """The reference's column-accumulation product (common.rs:66-105),
    batched: the parity/semantic oracle for :func:`mul_unsigned`."""
    pp = _pp_tensor(a, b)
    return Ciphered.new_from_raw(
        _mul_accumulate(pp, len(a), a.batch_shape), a.desc
    )


def mul_signed_lanes(
    a: Sequence[CipheredBit], b: Sequence[CipheredBit]
) -> list[CipheredBit]:
    """Wrapping signed (two's-complement) product on lane lists: the
    Baugh-Wooley sign corrections - XOR constant 1 into ``pp[0][n-1]`` and
    ``pp[n-1][0]`` before accumulation (common.rs:115-155) - feed the same
    width-dispatched accumulation as :func:`mul_unsigned_lanes`."""
    length = len(a)
    pp = _pp_lanes(a, b, length)
    pp[0][length - 1] = pp[0][length - 1].not_()
    pp[length - 1][0] = pp[length - 1][0].not_()
    batch = a[0].batch_shape if length else ()
    if length >= _csaplan.TREE_MIN_WIDTH:
        return _csa_accumulate(_pp_bits(pp, length), _csaplan.csa_plan(length), batch)
    return _mul_accumulate(pp, length, batch)


def mul_signed(a: Ciphered, b: Ciphered) -> Ciphered:
    """Wrapping signed product - carry-save tree default (Baugh-Wooley
    corrections are degree-free XORs with the trivial one, so the
    unsigned noise bound carries over; see :func:`mul_unsigned`)."""
    n = len(a)
    if n < _csaplan.TREE_MIN_WIDTH:
        return mul_signed_ref(a, b)
    pp = _pp_tensor(a, b)
    pp[0][n - 1] = pp[0][n - 1].not_()
    pp[n - 1][0] = pp[n - 1][0].not_()
    return Ciphered.new_from_raw(
        _csa_accumulate(_pp_bits(pp, n), _csaplan.csa_plan(n), a.batch_shape), a.desc
    )


def mul_signed_ref(a: Ciphered, b: Ciphered) -> Ciphered:
    """The reference's signed column-accumulation product
    (common.rs:115-163): the parity/semantic oracle for
    :func:`mul_signed`."""
    pp = _pp_tensor(a, b)
    n = len(a)
    pp[0][n - 1] = pp[0][n - 1].not_()
    pp[n - 1][0] = pp[n - 1][0].not_()
    return Ciphered.new_from_raw(
        _mul_accumulate(pp, n, a.batch_shape), a.desc
    )


# --------------------------------------------------------------------------
# N-ary sum + popcount (extensions; carry-save machinery reused)
# --------------------------------------------------------------------------


def sum_many(operands: "Sequence[Ciphered]") -> Ciphered:
    """Wrapping sum of ``k`` same-width operands (extension, N-ary).

    One carry-save tree over the k-row bit matrix
    (models/csaplan.py::sum_plan) + one final ripple add - ``O(log k)``
    batched compressor levels instead of ``k-1`` chained ripple adders
    (``(k-1)*(n-1)`` sequential multiplies), and FAR tighter noise:
    folding the adder over 8 u8 operands replays to worst degree ~2.0e8
    at delta=1 while the tree stays at 186
    (models/noise.py::sum_noise_degree vs chained_sum_noise_degree), so
    wide reductions keep all-keys-safe parameters.  The result wraps mod
    ``2^n`` exactly like folding :func:`add` over the operands.
    """
    ops = [o.densify() for o in operands]
    if not ops:
        raise ValueError("sum_many needs at least one operand")
    n = len(ops[0])
    if any(len(o) != n for o in ops):
        raise ValueError("sum_many operands must share one bit width")
    if len(ops) == 1:
        return ops[0]
    if len(ops) == 2:  # the uniform-width two-operand adder is tighter
        return add(ops[0], ops[1])
    k = len(ops)
    bits = {o * n + j: ops[o][j] for o in range(k) for j in range(n)}
    lanes = _csa_accumulate(
        bits, _csaplan.sum_plan(n, k), ops[0].batch_shape
    )
    return Ciphered.new_from_raw(lanes, ops[0].desc)


def popcount(a: Ciphered) -> Ciphered:
    """Homomorphic population count (extension): the number of set bits,
    as the same-width type.

    All ``n`` bit lanes start in column 0 with weight 1
    (models/csaplan.py::popcount_plan); the carry-save tree compresses
    them into the ``log2(n)+1`` result columns and the final ripple add
    settles the carries.  Upper output lanes are genuine ciphertext zeros
    (products of the tree), so the result composes with any downstream
    circuit.
    """
    a = a.densify()
    n = len(a)
    if n == 1:
        return a
    bits = {j: a[j] for j in range(n)}
    lanes = _csa_accumulate(
        bits, _csaplan.popcount_plan(n), a.batch_shape
    )
    return Ciphered.new_from_raw(lanes, a.desc)
