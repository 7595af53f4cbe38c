"""Batched GF(2) polynomial arithmetic on bit-packed uint32 limbs.

TPU-native re-design of the reference's polynomial backend
(reference: src/polynomial.rs).  Layout parity: coefficient of ``X^i`` is
bit ``i % 32`` of limb ``i // 32`` (LSB-first within each limb), the 32-bit
analogue of the reference's 64-bit-word layout (src/polynomial.rs:16-21,
confirmed by ``monomial`` at :142-150).  The on-wire byte format (LE bytes,
src/polynomial.rs:98-122) is therefore identical regardless of word size.

Every function is shape-polymorphic over leading batch dimensions; limbs
live on the trailing axis.  Shapes are static: a tensor of ``L`` limbs holds
polynomials of degree < ``32*L`` (the *degree class*); the dynamic per-
polynomial degree is computed on demand with :func:`compute_degree` rather
than stored, replacing the reference's cached ``degree`` field
(src/polynomial.rs:35-42) with a vectorized highest-set-bit reduction.

Design notes (TPU-first):

* XOR-add is a pure VPU elementwise op (reference: src/polynomial.rs:190-243).
* Carry-less multiply (:func:`clmul`) is a 32-step shift-AND-XOR sweep over
  bit planes followed by an anti-diagonal XOR reduction done with a zero-copy
  "skew" reshape - no data-dependent control flow, fully batched
  (replaces the schoolbook word loop at src/polynomial.rs:252-310).
* Remainder: reduction mod a fixed ``S`` is GF(2)-LINEAR in the dividend, so
  decryption uses a precomputed reduction table (:func:`reduction_rows`)
  instead of the data-dependent shift-XOR division loop
  (src/polynomial.rs:316-365).  An explicit fixed-trip masked division
  (:func:`rem_iterative`) is kept for API parity and as a cross-check oracle;
  it is branch-free and constant-time, unlike the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LIMB_BITS = 32
U32 = jnp.uint32


def limbs_for(bound: int) -> int:
    """Number of limbs needed for polynomials of degree <= ``bound``."""
    return bound // LIMB_BITS + 1


def bit_capacity(num_limbs: int) -> int:
    return num_limbs * LIMB_BITS


def bucket(num_limbs: int) -> int:
    """Round a limb count up to a geometric bucket (1/8-octave steps).

    Degree-class quantization: homomorphic circuits grow ciphertext degree
    at every AND, and exact limb counts would give every intermediate a
    unique static shape - one XLA compilation each.  Bucketing keeps the
    shape universe logarithmic (compile-cache hits) at <= 14% padded
    compute, and the padded sizes align better with TPU lanes anyway.
    """
    if num_limbs <= 8:
        return num_limbs
    q = 1 << max(0, (num_limbs - 1).bit_length() - 2)
    return -(-num_limbs // q) * q


def fit_limbs(x: jax.Array, num_limbs: int) -> jax.Array:
    """Pad or trim the limb axis to ``num_limbs``.

    Trimming is only sound when the caller knows the dropped limbs are zero
    (i.e. the true degree bound fits in ``num_limbs``)."""
    L = x.shape[-1]
    if L == num_limbs:
        return x
    if L < num_limbs:
        return pad_limbs(x, num_limbs)
    return x[..., :num_limbs]


# --------------------------------------------------------------------------
# Construction / padding
# --------------------------------------------------------------------------


def pad_limbs(x: jax.Array, num_limbs: int) -> jax.Array:
    """Zero-pad (or keep) the trailing limb axis to ``num_limbs``."""
    L = x.shape[-1]
    if L == num_limbs:
        return x
    if L > num_limbs:
        raise ValueError(f"cannot shrink limbs {L} -> {num_limbs}")
    pad = [(0, 0)] * (x.ndim - 1) + [(0, num_limbs - L)]
    return jnp.pad(x, pad)


def null(num_limbs: int = 1, batch: tuple[int, ...] = ()) -> jax.Array:
    """The null polynomial (degree 0 by convention, src/polynomial.rs:124-137)."""
    return jnp.zeros(batch + (num_limbs,), dtype=U32)


def monomial(degree: int, num_limbs: int | None = None) -> jax.Array:
    """``X^degree`` (src/polynomial.rs:139-150)."""
    L = limbs_for(degree) if num_limbs is None else num_limbs
    out = np.zeros(L, dtype=np.uint32)
    out[degree // LIMB_BITS] = np.uint32(1 << (degree % LIMB_BITS))
    return jnp.asarray(out)


# --------------------------------------------------------------------------
# Degree / evaluation
# --------------------------------------------------------------------------


def compute_degree(limbs: jax.Array) -> jax.Array:
    """Index of the highest set bit; 0 for the null polynomial (by convention).

    Vectorized analogue of the reference's ``compute_degree``
    (src/polynomial.rs:35-42): per-limb ``31 - clz`` plus limb offset,
    max-reduced over the limb axis.
    """
    L = limbs.shape[-1]
    clz = lax.clz(limbs.astype(jnp.int32)).astype(jnp.int32)
    offsets = (jnp.arange(L, dtype=jnp.int32) * LIMB_BITS).reshape(
        (1,) * (limbs.ndim - 1) + (L,)
    )
    cand = jnp.where(limbs != 0, offsets + (LIMB_BITS - 1) - clz, jnp.int32(-1))
    return jnp.maximum(jnp.max(cand, axis=-1), 0).astype(jnp.int32)


def is_null(limbs: jax.Array) -> jax.Array:
    return jnp.all(limbs == 0, axis=-1)


def evaluate_at_zero(limbs: jax.Array) -> jax.Array:
    """``P(0)`` = constant-term bit (src/polynomial.rs:168-173)."""
    return (limbs[..., 0] & 1).astype(U32)


def evaluate_at_one(limbs: jax.Array) -> jax.Array:
    """``P(1)`` = parity of the total popcount (src/polynomial.rs:175-181)."""
    pops = lax.population_count(limbs)
    return (jnp.sum(pops, axis=-1, dtype=U32) & 1).astype(U32)


def evaluate(limbs: jax.Array, x: bool) -> jax.Array:
    return evaluate_at_one(limbs) if x else evaluate_at_zero(limbs)


# --------------------------------------------------------------------------
# Add (XOR) family
# --------------------------------------------------------------------------


def xor(a: jax.Array, b: jax.Array) -> jax.Array:
    """Polynomial addition over GF(2) (src/polynomial.rs:190-213)."""
    L = max(a.shape[-1], b.shape[-1])
    return pad_limbs(a, L) ^ pad_limbs(b, L)


def xor_const_bit(a: jax.Array, bit: jax.Array | int) -> jax.Array:
    """Conditionally flip the constant term (src/polynomial.rs:237-243)."""
    bit = jnp.asarray(bit, dtype=U32)
    flip = jnp.zeros_like(a).at[..., 0].set(bit & 1)
    return a ^ flip


# --------------------------------------------------------------------------
# Shifts
# --------------------------------------------------------------------------


def shift_left_static(x: jax.Array, k: int, out_limbs: int) -> jax.Array:
    """``x << k`` (multiply by X^k) with static shift, into ``out_limbs``."""
    ws, bs = divmod(k, LIMB_BITS)
    xp = pad_limbs(x, out_limbs)
    rolled = jnp.roll(xp, ws, axis=-1)
    idx = jnp.arange(out_limbs)
    rolled = jnp.where(idx >= ws, rolled, U32(0))
    if bs == 0:
        return rolled
    lo = rolled << bs
    rolled1 = jnp.roll(xp, ws + 1, axis=-1)
    rolled1 = jnp.where(idx >= ws + 1, rolled1, U32(0))
    hi = rolled1 >> (LIMB_BITS - bs)
    return lo | hi


def shift_left_dynamic(x: jax.Array, shift: jax.Array, out_limbs: int) -> jax.Array:
    """``x << shift`` with a traced scalar shift, into ``out_limbs`` limbs."""
    shift = jnp.asarray(shift, dtype=jnp.int32)
    ws = shift // LIMB_BITS
    bs = (shift % LIMB_BITS).astype(U32)
    xp = pad_limbs(x, out_limbs)
    idx = jnp.arange(out_limbs, dtype=jnp.int32)
    r0 = jnp.where(idx >= ws, jnp.roll(xp, ws, axis=-1), U32(0))
    r1 = jnp.where(idx >= ws + 1, jnp.roll(xp, ws + 1, axis=-1), U32(0))
    lo = r0 << bs
    # (r1 >> (32 - bs)) expressed as (r1 >> 1) >> (31 - bs): safe at bs == 0.
    hi = (r1 >> 1) >> (U32(LIMB_BITS - 1) - bs)
    return lo | hi


# --------------------------------------------------------------------------
# Carry-less multiplication
# --------------------------------------------------------------------------


def _skew_xor_reduce(mat: jax.Array, T: int) -> jax.Array:
    """XOR-reduce anti-diagonals: out[m] = XOR_{i+j=m} mat[..., i, j].

    Uses the strided "skew" reshape: padding each of the R rows to T+1
    entries and reinterpreting the flat buffer as rows of T entries shifts
    row r right by exactly r positions, aligning anti-diagonals into
    columns.  Requires ``T >= R + C - 1``.
    """
    R, C = mat.shape[-2], mat.shape[-1]
    assert T >= R + C - 1
    lead = mat.shape[:-2]
    m = jnp.pad(mat, [(0, 0)] * len(lead) + [(0, 0), (0, T + 1 - C)])
    flat = m.reshape(*lead, R * (T + 1))[..., : R * T]
    skewed = flat.reshape(*lead, R, T)
    return lax.reduce(skewed, np.uint32(0), lax.bitwise_xor, (skewed.ndim - 2,))


def clmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Carry-less (GF(2)) polynomial product of bit-packed operands.

    ``a``: [..., La] limbs, ``b``: [..., Lb] limbs -> [..., La+Lb] limbs.
    Batched over leading dims (broadcast).  Branch-free 32-plane sweep
    replacing the reference's per-set-bit scalar loop
    (src/polynomial.rs:252-310); result length La+Lb limbs bounds the
    product degree ``da + db``.
    """
    La, Lb = a.shape[-1], b.shape[-1]
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a_e = jnp.broadcast_to(a[..., :, None], lead + (La, 1))
    b_e = jnp.broadcast_to(b[..., None, :], lead + (1, Lb))

    def body(k, carry):
        lo, hi = carry
        k32 = jnp.asarray(k, dtype=U32)
        sel = ((a_e >> k32) & 1) != 0
        lo = lo ^ jnp.where(sel, b_e << k32, U32(0))
        hi = hi ^ jnp.where(sel, (b_e >> 1) >> (U32(LIMB_BITS - 1) - k32), U32(0))
        return lo, hi

    # Derive the carry init from the operands (not jnp.zeros) so it inherits
    # their sharding/varying-axis tags under shard_map.
    zeros = (a_e & U32(0)) ^ (b_e & U32(0))
    lo, hi = lax.fori_loop(0, LIMB_BITS, body, (zeros, zeros))

    T = La + Lb - 1
    diag_lo = _skew_xor_reduce(lo, T)  # contributes to limb i+j
    diag_hi = _skew_xor_reduce(hi, T)  # contributes to limb i+j+1
    pad0 = [(0, 0)] * (diag_lo.ndim - 1)
    return jnp.pad(diag_lo, pad0 + [(0, 1)]) ^ jnp.pad(diag_hi, pad0 + [(1, 0)])


_CLMUL_ELEM_CAP = 1 << 22  # cap on La*Lb*batch elements materialized at once


def clmul_chunked(a: jax.Array, b: jax.Array) -> jax.Array:
    """:func:`clmul` with static chunking over the leading batch axis.

    Keeps the materialized [batch, La, Lb] pairwise-product tensor under a
    VMEM/HBM-friendly cap.  Shapes are static at trace time, so the chunk
    decision is a Python-level branch.
    """
    La, Lb = a.shape[-1], b.shape[-1]
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    batch = int(np.prod(lead)) if lead else 1
    if batch * La * Lb <= _CLMUL_ELEM_CAP or not lead:
        return clmul(a, b)
    af = jnp.broadcast_to(a, lead + (La,)).reshape(batch, La)
    bf = jnp.broadcast_to(b, lead + (Lb,)).reshape(batch, Lb)
    chunk = max(1, _CLMUL_ELEM_CAP // (La * Lb))
    n_chunks = -(-batch // chunk)
    padded = n_chunks * chunk
    if padded != batch:
        af = jnp.pad(af, [(0, padded - batch), (0, 0)])
        bf = jnp.pad(bf, [(0, padded - batch), (0, 0)])
    af = af.reshape(n_chunks, chunk, La)
    bf = bf.reshape(n_chunks, chunk, Lb)
    out = lax.map(lambda ab: clmul(ab[0], ab[1]), (af, bf))
    out = out.reshape(padded, La + Lb)[:batch]
    return out.reshape(lead + (La + Lb,))


# --------------------------------------------------------------------------
# Remainder
# --------------------------------------------------------------------------


def rem_iterative(c: jax.Array, s: jax.Array, s_degree: int) -> jax.Array:
    """Fixed-trip masked long division: remainder of ``c`` mod ``s``.

    Branch-free, constant-time re-design of the reference's data-dependent
    shift-XOR loop (src/polynomial.rs:316-365): exactly ``32*L - 1 -
    s_degree`` iterations, each conditionally XORing ``s << shift`` based on
    bit ``s_degree + shift`` of the running remainder.  ``s_degree`` is the
    static, exact degree of ``s`` (the secret-key degree ``d``).  Batched
    over leading dims of ``c``; ``s`` is shared.  Returns limbs of the same
    length as ``c`` (like the reference, which reuses the dividend buffer).
    """
    L = c.shape[-1]
    max_shift = bit_capacity(L) - 1 - s_degree
    if max_shift < 0:
        return c

    def body(i, r):
        shift = max_shift - i
        pos = s_degree + shift
        limb = lax.dynamic_index_in_dim(r, pos // LIMB_BITS, axis=-1, keepdims=False)
        bit = (limb >> jnp.asarray(pos % LIMB_BITS, U32)) & 1
        s_sh = shift_left_dynamic(s, shift, L)
        return r ^ (bit[..., None] * s_sh)

    return lax.fori_loop(0, max_shift + 1, body, c)


@functools.partial(jax.jit, static_argnums=(1, 2))
def reduction_rows(s: jax.Array, s_degree: int, n_rows: int) -> jax.Array:
    """Rows ``X^i mod S`` for i in [0, n_rows), bit-packed [n_rows, Ls].

    The core of linear-map reduction: ``C mod S = XOR_i C_i * (X^i mod S)``.
    Computed by the monic recurrence ``r' = (r << 1) ^ (bit_d(r << 1) ? S : 0)``
    (requires ``S`` of exact degree ``s_degree``, which keygen forces at
    src/polynomial.rs:89-90).  Ls = limbs_for(s_degree); bit ``s_degree`` of
    every row is 0.
    """
    Ls = limbs_for(s_degree)
    # fit, not pad: a key loaded from the reference's 64-bit-word byte
    # format may carry a trailing all-zero limb (e.g. d=64 -> 4 limbs of
    # which limb 3 is zero); trimming is sound because deg S = s_degree.
    sp = fit_limbs(s, Ls)
    r0 = monomial(0, Ls)

    def step(r, _):
        shifted = shift_left_static(r, 1, Ls)
        top = (
            shifted[..., s_degree // LIMB_BITS] >> jnp.asarray(s_degree % LIMB_BITS, U32)
        ) & 1
        nxt = shifted ^ (top[..., None] * sp)
        return nxt, r

    _, rows = lax.scan(step, r0, None, length=n_rows)
    return rows


def decrypt_mask(s: jax.Array, s_degree: int, n_limbs: int) -> jax.Array:
    """Packed vector ``w`` with ``w_i = (X^i mod S)(0)`` for i < 32*n_limbs.

    Decryption of a ciphered bit is then a single masked popcount parity:
    ``(C mod S)(0) = parity(popcount(C & w))`` - O(L) per bit instead of the
    reference's O(D*L) division (src/polynomial.rs:316-365 via
    src/cipher.rs:117-123).

    Runs the same monic recurrence as :func:`reduction_rows` but emits
    ONLY each row's constant bit: at u32-multiplication ciphertext sizes
    (~25M bit positions) the full rows tensor is ~19 GB and exceeded the
    chip's HBM; the mask itself is n_limbs u32s.
    """
    n_rows = bit_capacity(n_limbs)
    Ls = limbs_for(s_degree)
    sp = fit_limbs(s, Ls)
    r0 = monomial(0, Ls)

    def step(r, _):
        shifted = shift_left_static(r, 1, Ls)
        top = (
            shifted[..., s_degree // LIMB_BITS]
            >> jnp.asarray(s_degree % LIMB_BITS, U32)
        ) & 1
        nxt = shifted ^ (top[..., None] * sp)
        return nxt, (r[..., 0] & 1).astype(jnp.uint8)

    _, w_bits = lax.scan(step, r0, None, length=n_rows)
    return pack_bits(w_bits)


def decipher_bits(c: jax.Array, w: jax.Array) -> jax.Array:
    """Batched decrypt: parity(popcount(c & w)) over the limb axis.

    ``c``: [..., L] ciphered-bit limbs; ``w``: [L] mask from
    :func:`decrypt_mask`.  Returns uint32 0/1 with shape [...].

    Deliberately pure XLA: measured on the v5e at 0.19 ms for 2^21 bits at
    L=9 (2x the HBM read SOL) and 0.41 ms for 2^20 bits at L=65 (81% of
    read SOL) - XLA fuses mask+popcount+reduce over the minor axis without
    materializing intermediates.  A fused Pallas pass was prototyped and
    measured 3-35x SLOWER (a [TB, L] block with minor dim 9..65 forces a
    strided HBM->VMEM relayout); see PERF.md round-3 decrypt section.
    """
    pops = lax.population_count(c & w)
    return (jnp.sum(pops, axis=-1, dtype=U32) & 1).astype(U32)


def rem_linear(c: jax.Array, rows: jax.Array) -> jax.Array:
    """Full remainder via the linear map: ``c mod S`` for shared ``S``.

    ``c``: [..., L]; ``rows``: [32*L, Ls] from :func:`reduction_rows`.
    Returns [..., Ls].  The XOR-accumulation is a parity matmul (bit-plane
    popcount mod 2), which XLA maps onto the MXU.
    """
    L = c.shape[-1]
    n_bits = bit_capacity(L)
    assert rows.shape[0] >= n_bits
    c_bits = unpack_bits(c, n_bits, dtype=jnp.bfloat16)
    rows_bits = unpack_bits(
        rows[:n_bits], bit_capacity(rows.shape[-1]), dtype=jnp.bfloat16
    )
    counts = jnp.dot(c_bits, rows_bits, preferred_element_type=jnp.float32)
    return parity_pack(counts, rows.shape[-1])


# --------------------------------------------------------------------------
# Bit (un)packing
# --------------------------------------------------------------------------


def unpack_bits(limbs: jax.Array, n_bits: int, dtype=jnp.uint8) -> jax.Array:
    """[..., L] limbs -> [..., n_bits] of 0/1 ``dtype``, LSB-first."""
    L = limbs.shape[-1]
    need = -(-n_bits // LIMB_BITS)
    x = pad_limbs(limbs, max(L, need))[..., :need]
    shifts = jnp.arange(LIMB_BITS, dtype=U32)
    bits = (x[..., :, None] >> shifts) & 1
    return bits.reshape(*limbs.shape[:-1], need * LIMB_BITS)[..., :n_bits].astype(
        dtype
    )


@functools.lru_cache(maxsize=None)
def _pack_weights(D: int) -> np.ndarray:
    """[D, 2*Lp] f32 numpy constant: bit-column j contributes 2^(j%32) to
    limb j//32, split into low/high 16-bit halves so every MXU partial sum
    stays exact in f32 (<= sum of 2^k for k < 16 = 65535 << 2^24).  Kept as
    numpy (converted per trace) so the cache never captures a tracer."""
    padded = -(-D // LIMB_BITS) * LIMB_BITS
    Lp = padded // LIMB_BITS
    col = np.arange(D)[:, None]
    limb = np.arange(Lp)[None, :]
    k = col - limb * LIMB_BITS
    in_limb = (k >= 0) & (k < LIMB_BITS)
    w_lo = np.where(in_limb & (k < 16), 1 << np.maximum(k, 0), 0)
    w_hi = np.where(in_limb & (k >= 16), 1 << np.maximum(k - 16, 0), 0)
    return np.concatenate([w_lo, w_hi], axis=1).astype(np.float32)


def parity_pack(counts: jax.Array, out_limbs: int) -> jax.Array:
    """Integer-valued ``counts`` [..., D] -> packed parity limbs [..., out_limbs].

    Takes each column's count mod 2 and packs the resulting bit-columns into
    uint32 limbs with ONE MXU matmul against a constant weight matrix
    (powers of two are bf16-exact; f32 accumulation keeps the 16-bit halves
    exact).  This is the pack stage of the encrypt path and of
    :func:`rem_linear` - measured ~2x faster end-to-end than the
    shift-multiply-reduce pack on the VPU.
    """
    D = counts.shape[-1]
    Lp = -(-D // LIMB_BITS)
    cbits = (counts.astype(jnp.int32) & 1).astype(jnp.bfloat16)
    w = jnp.asarray(_pack_weights(D), dtype=jnp.bfloat16)
    lohi = jnp.matmul(cbits, w, preferred_element_type=jnp.float32)
    lohi = lohi.astype(jnp.int32)
    limbs = lohi[..., :Lp].astype(U32) | (lohi[..., Lp:].astype(U32) << U32(16))
    return fit_limbs(limbs, out_limbs)


def pack_bits(bits: jax.Array) -> jax.Array:
    """[..., n] of 0/1 -> [..., ceil(n/32)] uint32 limbs, LSB-first."""
    n = bits.shape[-1]
    L = -(-n // LIMB_BITS)
    pad = [(0, 0)] * (bits.ndim - 1) + [(0, L * LIMB_BITS - n)]
    b = jnp.pad(bits.astype(U32), pad).reshape(*bits.shape[:-1], L, LIMB_BITS)
    weights = (U32(1) << jnp.arange(LIMB_BITS, dtype=U32)).astype(U32)
    return jnp.sum(b * weights, axis=-1, dtype=U32)


# --------------------------------------------------------------------------
# Host-side serialization (byte format parity with src/polynomial.rs:98-122)
# --------------------------------------------------------------------------


def limbs_to_bytes(limbs: np.ndarray | jax.Array) -> bytes:
    """Little-endian concatenation of limbs (src/polynomial.rs:98-105)."""
    arr = np.asarray(limbs, dtype=np.uint32)
    return arr.astype("<u4").tobytes()


def limbs_from_bytes(data: bytes) -> np.ndarray:
    """Bytes -> limbs, zero-padding the trailing partial limb
    (src/polynomial.rs:107-122; word-size agnostic)."""
    if len(data) == 0:
        raise ValueError("The vector of bytes must not be empty.")
    n = -(-len(data) // 4)
    buf = np.zeros(n * 4, dtype=np.uint8)
    buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    return buf.view("<u4").astype(np.uint32)
