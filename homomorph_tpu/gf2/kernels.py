"""Pallas TPU kernels for the GF(2) hot paths.

The jnp clmul in :mod:`homomorph_tpu.gf2.poly` materializes the full
[batch, La, Lb] pairwise-product tensor in HBM across ~100 XLA elementwise
ops.  The Pallas kernel here streams everything through VMEM in one pass:

* layout: limbs on sublanes, batch on the 128-wide lane axis
  ([L, B] tiles), so the 32 bit-plane sweeps and the anti-diagonal
  accumulation are pure VPU ops with no HBM round-trips;
* the accumulator lives in the output VMEM block; each of the 32 bit
  planes does ``2*Lb`` masked shift-XOR updates at static row offsets -
  the anti-diagonal (skew) reduction is implicit in the offset writes.

Work per output element is the schoolbook optimum O(La*Lb*32/32) limb ops;
the kernel is VPU-throughput-bound.

Dispatch: :func:`clmul` picks the Pallas kernel on TPU backends for batches
that fill the lane axis, the pure-jnp path otherwise (CPU tests run the
kernel in interpreter mode via ``HOMOMORPH_TPU_INTERPRET=1``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import poly as gf2

LANES = 128
U32 = jnp.uint32

_INTERPRET = os.environ.get("HOMOMORPH_TPU_INTERPRET", "0") == "1"


def is_tpu_backend() -> bool:
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ("tpu", "axon")


def _kernel_enabled() -> bool:
    return _INTERPRET or is_tpu_backend()


# --------------------------------------------------------------------------
# clmul kernel
# --------------------------------------------------------------------------


def _clmul_kernel_body(a_ref, b_ref, o_ref, *, Lb: int, La: int):
    from jax.experimental import pallas as pl  # noqa: F401

    o_ref[:] = jnp.zeros_like(o_ref)

    def plane(k, _):
        k32 = jnp.asarray(k, U32)
        sel = ((a_ref[:] >> k32) & 1) != 0  # [La, TB]
        # The lo-part of small-operand limb t and the hi-part (carry-out)
        # of limb t-1 target the SAME output rows [t, t+La) under the SAME
        # mask, and where(sel,A,0) ^ where(sel,B,0) = where(sel, A^B, 0) -
        # so one merged read-modify-write pass per t instead of two
        # (2*Lb -> Lb+1 passes per plane; measured ~1.8x on the adder).
        for t in range(Lb + 1):  # static unroll over the small operand
            term = None
            if t < Lb:
                bt = b_ref[t, :][None, :]  # [1, TB]
                term = bt << k32
            if t >= 1:
                bp = b_ref[t - 1, :][None, :]
                hi = (bp >> 1) >> (U32(31) - k32)
                term = hi if term is None else term ^ hi
            o_ref[t : t + La, :] ^= jnp.where(sel, term, U32(0))
        return 0

    jax.lax.fori_loop(0, 32, plane, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _clmul_pallas_T(aT: jax.Array, bT: jax.Array, La: int, Lb: int) -> jax.Array:
    """Transposed-layout clmul: aT [La, B], bT [Lb, B] -> [La+Lb, B]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = aT.shape[1]
    TB = LANES
    grid = (B // TB,)
    kern = functools.partial(_clmul_kernel_body, Lb=Lb, La=La)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((La, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((La + Lb, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((La + Lb, B), jnp.uint32),
        interpret=_INTERPRET,
    )(aT, bT)


# max limbs of the smaller operand before the unrolled kernel body gets too
# large; above this we fall back to the jnp path (or future blocked kernel).
_MAX_SMALL_LIMBS = 48
# VMEM budget: (2*(La+Lb)) * TB * 4 bytes should stay well under ~12MB
_MAX_TOTAL_LIMBS = 4096


_STRIP = 32  # strip width (limbs) when both operands exceed the kernel cap

# smaller-operand limb count above which Karatsuba splitting beats the
# schoolbook strips: each level turns one LxL product into three (L/2)x(L/2)
# products (25% less limb work) plus O(L) XORs, and recursion compounds.
# The floor sets the RECURSION BASE CASE: below it, products run as strip
# sweeps whose (Lb+1) read-modify-write passes cover the full big-operand
# row extent - at tiny rows the kernel is per-pass-overhead-bound, so
# recursing all the way down (the round-3 value, 64) drives the u16
# multiplier's ripple into thousands of ~46-limb base products running
# far off the VPU roofline.  Tunable for measurement
# (HOMOMORPH_TPU_KARATSUBA_MIN); default re-measured in round 5 on the
# u16 multiplier (see PERF.md round-5 ripple section).
# TPU-only: on XLA:CPU the unrolled 3^k-subcall recursion balloons compile
# time far past the compute it saves (tests set FORCE_KARATSUBA for
# coverage).
_KARATSUBA_MIN = int(os.environ.get("HOMOMORPH_TPU_KARATSUBA_MIN", "64"))
FORCE_KARATSUBA = os.environ.get("HOMOMORPH_TPU_FORCE_KARATSUBA", "0") == "1"

# Shapes above these route to the blocked-scan path (_clmul_scan_blocked).
# Rationale: the inline Karatsuba recursion's 3^depth sub-product
# expansion makes the TRACE (and XLA compile time) explode at the operand
# sizes u32+ multiplication produces (hundreds of thousands of limbs; a
# 50-minute compile was measured and killed), and the pure-jnp path
# materializes [B, La, Lb] - memory-infeasible there.  Thresholds are
# placed JUST ABOVE the u16 multiplier's largest product (small operand
# 2,881 limbs, total 19,265 - replayed from the csa plan), so every
# shape benchmarked through round 3 keeps its measured Karatsuba path
# bit-for-bit, while the u32 program's 78 giant products (small up to
# 40,609 limbs, total up to 564,897) become compile-feasible.
# Env-overridable for tests.
_SCAN_SMALL_MIN = int(os.environ.get("HOMOMORPH_TPU_SCAN_MIN_SMALL", "4096"))
_SCAN_TOTAL_MIN = int(os.environ.get("HOMOMORPH_TPU_SCAN_MIN_TOTAL", "20480"))
_SCAN_BLOCK_LIMBS = 2048  # big-operand block (VMEM: (2*(2048+48))*128*4 ~ 2.1MB)


def clmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched carry-less multiply with Pallas + Karatsuba fast paths.

    Same contract as :func:`homomorph_tpu.gf2.poly.clmul`: [..., La] x
    [..., Lb] -> [..., La+Lb] with broadcast leading dims.

    Dispatch (all decisions on static shapes, inside jit):

    * both operands >= ``_KARATSUBA_MIN`` limbs and roughly balanced ->
      recursive Karatsuba split (GF(2): the middle term is
      ``(a0^a1)(b0^b1) ^ p0 ^ p2``, subtraction == XOR);
    * very unbalanced large x large -> the big operand is chunked into
      small-operand-sized pieces (XOR-combined at static offsets), each
      balanced piece then recurses;
    * small operand <= ``_MAX_SMALL_LIMBS`` -> the Pallas kernel (strips of
      ``_STRIP`` limbs above that), when on a TPU backend with a batch that
      fills the 128-wide lane axis;
    * otherwise the pure-jnp path.

    When a limb mesh is registered
    (:func:`homomorph_tpu.parallel.limbmul.set_default_limb_mesh`), large
    unbalanced products are first offered to the limb-sharded multi-chip
    path; it declines (returns None) when the shapes don't qualify.
    """
    from ..parallel import limbmul as _limbmul

    sharded = _limbmul.maybe_sharded_clmul(a, b)
    if sharded is not None:
        return sharded
    La, Lb = a.shape[-1], b.shape[-1]
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    batch = int(np.prod(lead)) if lead else 1
    af = jnp.broadcast_to(a, lead + (La,)).reshape(batch, La)
    bf = jnp.broadcast_to(b, lead + (Lb,)).reshape(batch, Lb)
    out = _clmul_flat(af, bf)
    return out.reshape(lead + (La + Lb,))


def _pad_cols(x: jax.Array, n: int, left: int = 0) -> jax.Array:
    """Pad the limb axis of a flat [B, L] tensor to ``left + L + ...`` = n."""
    L = x.shape[1]
    return jnp.pad(x, [(0, 0), (left, n - left - L)])


def _clmul_flat(af: jax.Array, bf: jax.Array) -> jax.Array:
    """clmul on flat [B, La] x [B, Lb] -> [B, La+Lb]."""
    B, La = af.shape
    Lb = bf.shape[1]
    small, big = (af, bf) if La <= Lb else (bf, af)
    Ls, Lg = small.shape[1], big.shape[1]

    if _kernel_enabled() and (
        Ls > _SCAN_SMALL_MIN
        or (Ls + Lg) > _SCAN_TOTAL_MIN
        # low-batch mid-size products would fall through to the jnp path,
        # which materializes [B, La, Lb] - gigabytes (OOMed the u32
        # ripple's g precomputes at (8, ~16k, ~4k)); the scan path packs
        # blocks onto the kernel's spare lanes instead
        or (B < LANES and (Ls + Lg) > _MAX_TOTAL_LIMBS)
    ):
        return _clmul_scan_blocked(big, small)

    if Ls >= _KARATSUBA_MIN and (_kernel_enabled() or FORCE_KARATSUBA):
        if Lg > (3 * Ls) // 2:
            # chunk the big operand into Ls-limb pieces at static offsets;
            # every piece product is balanced and recurses into Karatsuba.
            parts = []
            for c0 in range(0, Lg, Ls):
                w = min(Ls, Lg - c0)
                p = _clmul_flat(big[:, c0 : c0 + w], small)  # [B, w+Ls]
                parts.append(_pad_cols(p, Lg + Ls, left=c0))
            out = parts[0]
            for p in parts[1:]:
                out = out ^ p
            return out
        return _karatsuba_flat(small, big)

    if _kernel_enabled() and (Ls + Lg) > _MAX_TOTAL_LIMBS:
        # too big for one VMEM-resident strip sweep but below (or diverted
        # from) the Karatsuba branch: the blocked scan handles any shape
        # with bounded VMEM (the jnp fallback would materialize [B,La,Lb])
        return _clmul_scan_blocked(big, small)
    if not _kernel_enabled() or B < LANES:
        return gf2.clmul_chunked(af, bf)

    pad = (-B) % LANES
    if pad:
        big = jnp.pad(big, [(0, pad), (0, 0)])
        small = jnp.pad(small, [(0, pad), (0, 0)])

    if Ls <= _MAX_SMALL_LIMBS:
        outT = _clmul_pallas_T(big.T, small.T, Lg, Ls)
        return outT.T[:B]

    # strip decomposition over the smaller operand
    aT = big.T
    acc = jnp.zeros((Lg + Ls, big.shape[0]), dtype=jnp.uint32)
    for c0 in range(0, Ls, _STRIP):
        w = min(_STRIP, Ls - c0)
        stripT = small[:, c0 : c0 + w].T
        prodT = _clmul_pallas_T(aT, stripT, Lg, w)  # [Lg + w, B]
        acc = acc.at[c0 : c0 + Lg + w, :].set(
            acc[c0 : c0 + Lg + w, :] ^ prodT
        )
    return acc.T[:B]


def _clmul_scan_blocked(big: jax.Array, small: jax.Array) -> jax.Array:
    """Huge-operand clmul: [B, Lg] x [B, Ls] -> [B, Lg+Ls] with O(1)
    TRACE size and bounded VMEM, for shapes where every inline path
    breaks down (see ``_SCAN_TOTAL_MIN``).

    Structure: the BIG operand's limb axis is cut into
    ``_SCAN_BLOCK_LIMBS``-limb blocks laid onto the Pallas kernel's
    128-wide lane axis alongside the batch (so small batches like the
    multiplier's per-bit lanes fill the kernel for free), and the SMALL
    operand is swept in ``_MAX_SMALL_LIMBS``-limb strips by ONE
    ``lax.scan`` whose body is compiled once: slice strip -> kernel
    product against ALL blocks -> XOR into the accumulator window at the
    strip offset.  Block results are recombined at their limb offsets
    after the scan (one XOR per block, static).

    Work is schoolbook per strip (no Karatsuba saving - the trade for a
    trace that does not grow with operand size); each strip pass is the
    same merged-pass kernel the small-operand path uses, so per-strip
    efficiency matches the measured kernel roofline.
    """
    B, Lg = big.shape
    Ls = small.shape[1]
    out_len = Lg + Ls

    # Coarse HALF-OCTAVE shape quantization ({2^k, 1.5*2^k} on both limb
    # axes, pow-2 on the batch): the scan program costs minutes of
    # XLA+Mosaic compile per distinct shape (measured ~140 s at
    # (8,4096,2048)) while executing in ~ms, and the u32 multiplier
    # produces dozens of distinct giant shapes - quantization collapses
    # them to a handful of cached programs for <= 33% padding work.
    def _half_octave(n: int) -> int:
        k = max(n.bit_length() - 1, 5)
        if n <= (1 << k):
            return 1 << k
        if n <= 3 * (1 << (k - 1)):
            return 3 * (1 << (k - 1))
        return 1 << (k + 1)

    Bq = max(8, 1 << (B - 1).bit_length())
    if Bq != B:
        big = jnp.pad(big, [(0, Bq - B), (0, 0)])
        small = jnp.pad(small, [(0, Bq - B), (0, 0)])
    Lgq, Lsq = _half_octave(Lg), _half_octave(Ls)
    big = _pad_cols(big, Lgq)
    small = _pad_cols(small, Lsq)
    Borig, B, Lg, Ls = B, Bq, Lgq, Lsq

    K = _MAX_SMALL_LIMBS
    Lblk = min(max(Lg, K), _SCAN_BLOCK_LIMBS)
    nblk = -(-Lg // Lblk)
    nstrips = -(-Ls // K)
    SK = nstrips * K
    Lgp = nblk * Lblk

    # blocks -> lanes, block-major: lane index j*B + b holds block j of
    # row b.  The big operand is the ONLY per-lane-expanded buffer; the
    # small operand stays [SK, B] and is broadcast per strip inside the
    # body (an early version tiled it nblk-fold up front and kept a
    # per-block-window accumulator - ~30x the live memory, enough to OOM
    # the chip on the u32 multiplier's product set).
    bigp = _pad_cols(big, Lgp).reshape(B, nblk, Lblk)
    bigT = jnp.transpose(bigp, (2, 1, 0)).reshape(Lblk, nblk * B)
    smallT = _pad_cols(small, SK).T  # [SK, B]
    Bn = nblk * B
    lane_pad = (-Bn) % LANES
    if lane_pad:
        bigT = jnp.pad(bigT, [(0, 0), (0, lane_pad)])

    # global accumulator [B, W]: strip k contributes a [Lgp + Lblk]-wide
    # window at limb offset k*K (block bodies tile contiguously; each
    # block's K-limb tail lands in the next block's head)
    W = Lgp + Lblk + SK
    acc0 = jnp.zeros((B, W), dtype=jnp.uint32)

    def body(acc, k):
        off = k * K
        strip = jax.lax.dynamic_slice(smallT, (off, 0), (K, B))
        stripT = jnp.broadcast_to(strip[:, None, :], (K, nblk, B)).reshape(
            K, Bn
        )
        if lane_pad:
            stripT = jnp.pad(stripT, [(0, 0), (0, lane_pad)])
        prod = _clmul_pallas_T(bigT, stripT, Lblk, K)  # [Lblk+K, Bn+pad]
        prod = prod[:, :Bn].reshape(Lblk + K, nblk, B)
        # block bodies tile contiguously at j*Lblk; the K-limb tails sit
        # at (j+1)*Lblk - one reshape each, then a shifted XOR
        bodies = jnp.transpose(prod[:Lblk], (2, 1, 0)).reshape(B, Lgp)
        tails = jnp.pad(prod[Lblk:], [(0, Lblk - K), (0, 0), (0, 0)])
        tails = jnp.transpose(tails, (2, 1, 0)).reshape(B, Lgp)
        contrib = jnp.pad(bodies, [(0, 0), (0, Lblk)]) ^ jnp.pad(
            tails, [(0, 0), (Lblk, 0)]
        )
        win = jax.lax.dynamic_slice(acc, (0, off), (B, Lgp + Lblk))
        return jax.lax.dynamic_update_slice(acc, win ^ contrib, (0, off)), None

    acc, _ = jax.lax.scan(body, acc0, jnp.arange(nstrips))
    return acc[:Borig, :out_len]


def _karatsuba_flat(small: jax.Array, big: jax.Array) -> jax.Array:
    """One Karatsuba level on roughly balanced flat operands.

    ``small``: [B, Ls], ``big``: [B, Lg], Ls <= Lg <= 1.5*Ls.  Returns
    [B, Ls+Lg].  With a0/a1 (b0/b1) the low/high halves at split ``h``:

        a*b = p0 ^ (pm ^ p0 ^ p2) X^(32h) ^ p2 X^(64h),
        p0 = a0*b0,  p2 = a1*b1,  pm = (a0^a1)*(b0^b1).

    Sub-products recurse through :func:`_clmul_flat` (further Karatsuba
    levels down to the Pallas kernel's small-operand base case).
    """
    Ls, Lg = small.shape[1], big.shape[1]
    L = Lg
    sp = _pad_cols(small, L)
    h = (L + 1) // 2

    a0, a1 = big[:, :h], big[:, h:]
    b0, b1 = sp[:, :h], sp[:, h:]
    p0 = _clmul_flat(a0, b0)  # [B, 2h]
    p2 = _clmul_flat(a1, b1)  # [B, 2(L-h)]
    am = a0 ^ _pad_cols(a1, h)
    bm = b0 ^ _pad_cols(b1, h)
    pm = _clmul_flat(am, bm)  # [B, 2h]

    mid = pm ^ p0 ^ _pad_cols(p2, 2 * h)
    out = (
        _pad_cols(p0, 2 * L)
        ^ _pad_cols(mid, 2 * L, left=h)
        ^ _pad_cols(p2, 2 * L, left=2 * h)
    )
    return out[:, : Ls + Lg]
