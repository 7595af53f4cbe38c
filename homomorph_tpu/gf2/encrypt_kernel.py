"""Batched encryption from packed selection words.

Pipeline: unpack packed selection words -> MXU parity matmul against the
public key's bit planes -> mod-2 -> repack limbs -> XOR plaintext.

Two implementations:

* **XLA (default)**: unpack to bf16 in XLA, counts matmul, then
  :func:`homomorph_tpu.gf2.poly.parity_pack` (a second MXU matmul doing
  parity + limb pack in one pass).  Measured fastest - see
  :func:`encrypt_bits_fused`.
* **Pallas** (``HOMOMORPH_TPU_ENC_IMPL=pallas``): the single-VMEM-pass
  kernel variants below.  Kept as a baseline: Mosaic currently lowers the
  in-kernel word unpack at poor lane occupancy, making them ~4x slower
  than the XLA pipeline despite lower HBM traffic.

Math note: XOR over a selected subset of pk rows == per-column popcount
parity; counts are exact in bf16 up to tau <= 256 and in f32 up to 2^24
(bf16 inputs are 0/1, MXU accumulates f32) - see SURVEY §7 / cipher.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import poly as gf2
from .kernels import _INTERPRET, LANES, is_tpu_backend

U32 = jnp.uint32


def _encrypt_kernel_v2(selw_ref, pkbits_ref, plain_ref, out_ref, *, tau: int, L: int):
    """Full-lane variant: unpack via lane-repeat, repack via MXU matmuls.

    Every intermediate is [TB, >=128] so the VPU runs at full lane
    occupancy; the bit->limb repack is two MXU matmuls against constant
    weight matrices (split 16/16 so all values stay exact in f32).
    """
    from jax.experimental.pallas import tpu as pltpu

    TB = selw_ref.shape[0]
    D = pkbits_ref.shape[1]
    W = selw_ref.shape[1]

    # unpack: pltpu.repeat TILES the words ([w0 w1 .. w0 w1 ..]), so column
    # c holds word c % W; shifting by c // W extracts tau index
    # (c % W)*32 + c // W.  The caller pre-permutes the pk rows into that
    # order (zero rows beyond tau), so no slicing/reordering is needed here
    # and every op is a full-lane [TB, 32*W] op.
    rep = pltpu.repeat(selw_ref[:], 32, axis=1)  # [TB, 32*W]
    shifts = jax.lax.broadcasted_iota(U32, (1, 32 * W), 1) // U32(W)
    bits = (rep >> shifts) & 1
    sel = bits.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    counts = jnp.dot(sel, pkbits_ref[:], preferred_element_type=jnp.float32)
    cbits = (counts.astype(jnp.int32) & 1).astype(jnp.float32)  # [TB, D]

    # repack D bit-columns into L uint32 limbs with two constant-weight
    # matmuls: column j contributes 2^(j%32) to limb j//32; low/high 16-bit
    # halves keep every partial sum exact in f32.
    padded = (D + 31) // 32 * 32
    Lp = padded // 32
    col = jax.lax.broadcasted_iota(jnp.int32, (D, Lp), 0)
    limb = jax.lax.broadcasted_iota(jnp.int32, (D, Lp), 1)
    k = col - limb * 32
    in_limb = (k >= 0) & (k < 32)
    w_lo = jnp.where(in_limb & (k < 16), (1 << jnp.maximum(k, 0)), 0).astype(
        jnp.float32
    )
    kh = jnp.maximum(k - 16, 0)
    w_hi = jnp.where(in_limb & (k >= 16), (1 << kh), 0).astype(jnp.float32)
    lo = jnp.dot(cbits, w_lo, preferred_element_type=jnp.float32).astype(jnp.int32)
    hi = jnp.dot(cbits, w_hi, preferred_element_type=jnp.float32).astype(jnp.int32)
    # combine with MULTIPLY, not shift: Mosaic miscompiles shift-by-constant
    # on lane-sliced vectors (measured on v5e: slice+cast+shl16 drops the
    # byte; slice+cast+mul 2^16 is exact) - see exp_enc.py repro.
    limbs = (lo.astype(U32)) | (hi.astype(U32) * U32(1 << 16))  # [TB, Lp]
    if Lp >= L:
        limbs = limbs[:, :L]
    else:
        limbs = jnp.pad(limbs, ((0, 0), (0, L - Lp)))
    flip = jnp.concatenate(
        [plain_ref[:] & 1, jnp.zeros((TB, L - 1), dtype=U32)], axis=1
    )
    out_ref[:] = limbs ^ flip


def _encrypt_kernel(selw_ref, pkbits_ref, plain_ref, out_ref, *, tau: int, L: int):
    # selw_ref:   [TB, W]  packed selection words (W = ceil(tau/32))
    # pkbits_ref: [tau, D] bf16 bit planes (resident)
    # plain_ref:  [TB, 1]  plaintext bits
    # out_ref:    [TB, L]  ciphertext limbs
    TB = selw_ref.shape[0]
    D = pkbits_ref.shape[1]
    W = selw_ref.shape[1]

    # Unpack selection words -> [TB, tau] bf16 0/1.  Mosaic-friendly 2-D
    # ops only: per packed word, broadcast against a 32-lane shift iota and
    # concatenate (no 3-D reshapes, no uint32->bf16 direct cast).
    shifts = jax.lax.broadcasted_iota(U32, (1, 32), 1)
    selw = selw_ref[:]  # [TB, W]
    cols = [((selw[:, w : w + 1] >> shifts) & 1) for w in range(W)]
    sel_u32 = jnp.concatenate(cols, axis=1)[:, :tau]  # [TB, tau]
    sel = sel_u32.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    counts = jnp.dot(sel, pkbits_ref[:], preferred_element_type=jnp.float32)
    cbits = counts.astype(jnp.int32) & 1  # [TB, D]

    # Pack D bit columns -> L uint32 limbs.  Mosaic lacks unsigned
    # reductions, so accumulate in int32 (two's-complement wraparound gives
    # the exact uint32 value); per-limb lane reduction over 32 columns.
    weights = jnp.int32(1) << jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    padded = (D + 31) // 32 * 32
    if padded != D:
        cbits = jnp.pad(cbits, ((0, 0), (0, padded - D)))
    limb_cols = []
    for l in range(min(L, padded // 32)):
        seg = cbits[:, 32 * l : 32 * (l + 1)]  # [TB, 32]
        limb_cols.append(
            jnp.sum(seg * weights, axis=1, keepdims=True, dtype=jnp.int32)
        )
    limbs = jnp.concatenate(limb_cols, axis=1).astype(U32)  # [TB, <=L]
    if limbs.shape[1] < L:
        limbs = jnp.pad(limbs, ((0, 0), (0, L - limbs.shape[1])))
    # xor plaintext into the constant term
    flip = jnp.concatenate(
        [plain_ref[:] & 1, jnp.zeros((TB, L - 1), dtype=U32)], axis=1
    )
    out_ref[:] = limbs ^ flip


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _encrypt_fused(selw, pk_bits, plain, tau: int, L: int, v2: bool = True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, W = selw.shape
    D = pk_bits.shape[1]
    # Adaptive tile: counts f32 + cbits i32 + sel bf16 per tile must fit
    # VMEM alongside the resident pk block (~12 bytes per (row, D) element).
    TB = int(os.environ.get("HOMOMORPH_TPU_ENC_TB", "512"))
    while TB > 128 and (TB * D * 12 > (6 << 20) or B % TB):
        TB //= 2
    grid = (B // TB,)
    if v2:
        # permute pk rows into the kernel's tiled-unpack order:
        # column c <- tau index (c % W)*32 + c // W; rows beyond tau are 0.
        c = jnp.arange(32 * W)
        idx = (c % W) * 32 + c // W
        valid = idx < tau
        pk_bits = jnp.where(
            valid[:, None],
            jnp.take(pk_bits, jnp.minimum(idx, tau - 1), axis=0),
            jnp.zeros((1, D), pk_bits.dtype),
        )
    kern = functools.partial(
        _encrypt_kernel_v2 if v2 else _encrypt_kernel, tau=tau, L=L
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pk_bits.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.uint32),
        interpret=_INTERPRET,
    )(selw, pk_bits, plain)


# "xla" (default) | "pallas" (v2 full-lane kernel) | "pallas_v1" (baseline)
_ENC_IMPL = os.environ.get("HOMOMORPH_TPU_ENC_IMPL", "xla")
_USE_PALLAS_ENC = _ENC_IMPL in ("pallas", "pallas_v1")

# B-axis segment for the lax.map encrypt pipeline (round 4): at large
# batches the unsegmented pipeline is HBM-bound on the sel/counts
# round-trips between its two matmuls (PERF.md round-2 model: 3.4 of
# 3.5 GB/step); mapping the pipeline over 32k-bit segments lets XLA's
# memory-space assignment keep each segment's intermediates VMEM-resident
# - measured 371 -> 623 M bit-enc/s device-busy at B=2^21 on the v5e
# (exp_enc_chunked.py; segment sweep 8k/32k/128k within a few %).
# 0 disables segmentation.
_ENC_SEGMENT = int(os.environ.get("HOMOMORPH_TPU_ENC_SEGMENT", "32768"))


def encrypt_bits_fused(
    selw: jax.Array, pk_bits: jax.Array, plain: jax.Array, L: int
) -> jax.Array:
    """Encryption of a flat bit batch from packed selection words.

    ``selw``: [B, ceil(tau/32)] packed selection words; ``pk_bits``:
    [tau, D] bf16; ``plain``: [B] 0/1.  Returns [B, L] uint32.

    Default path is pure XLA: unpack straight to bf16, one MXU matmul for
    the counts, one MXU matmul for parity + limb pack.  Measured on a v5e:
    the XLA pipeline beats the handwritten Pallas kernel above ~4x (28.5 ms
    -> 5.8 ms for 2^21 bits) - Mosaic lowers the in-kernel word-unpack
    poorly (a [TB, W] block uses W/128 of the lane axis), while XLA fuses
    the unpack into full-lane ops and pipelines the two matmuls.  The
    Pallas kernel is kept (``HOMOMORPH_TPU_ENC_IMPL=pallas``) as the
    baseline for future Mosaic revisions.
    """
    tau = pk_bits.shape[0]
    B = selw.shape[0]
    if (
        _USE_PALLAS_ENC
        and (_INTERPRET or is_tpu_backend())
        and B % 128 == 0
        and B > 0
    ):
        return _encrypt_fused(
            selw,
            pk_bits,
            plain[:, None].astype(U32),
            tau,
            L,
            v2=(_ENC_IMPL != "pallas_v1"),
        )
    from ..cipher import _encrypt_core

    # segmented pipeline: unpack + both matmuls per 32k-bit segment so the
    # intermediates stay VMEM-resident (see _ENC_SEGMENT above).  The
    # plaintext CAN be folded INTO the counts matmul as one extra
    # public-key row e_0 selected by the plaintext bit: parity
    # (count + plain) flips exactly the constant-term bit, so no
    # elementwise op follows the pack matmul at all (round 4 had to pin a
    # post-map xor behind an optimization_barrier - any elementwise
    # consumer fused into the map body defeats the VMEM promotion).  But
    # the extra column is only free when it lands in the sel tile's
    # EXISTING lane padding: at tau % 128 == 0 (the headline tau=128)
    # tau+1 columns pad to the next 128-lane tile and the counts matmul
    # nearly doubles - measured 412.7 vs 667.2 M bit-enc/s device-busy
    # on the v5e (round-5 A/B), so aligned tau keeps the barrier'd-xor
    # path.  bf16 counts additionally require tau + 1 <= 256.
    seg = _ENC_SEGMENT
    if seg and B > seg and B % seg == 0 and is_tpu_backend():
        W = selw.shape[1]
        fold_plain = (tau + 1 <= 256) and (tau % 128 != 0)
        if fold_plain:
            D = pk_bits.shape[1]
            e0 = jnp.zeros((1, D), dtype=pk_bits.dtype).at[0, 0].set(1)
            pk_ext = jnp.concatenate([pk_bits, e0], axis=0)
            plain_seg = plain.reshape(B // seg, seg).astype(jnp.bfloat16)

            def one_segment(args):
                sw, pb = args
                sel = gf2.unpack_bits(sw, tau, dtype=jnp.bfloat16)
                sel = jnp.concatenate([sel, pb[:, None]], axis=1)
                counts = jnp.matmul(
                    sel, pk_ext, preferred_element_type=jnp.bfloat16
                )
                return gf2.parity_pack(counts, L)

            out = jax.lax.map(
                one_segment, (selw.reshape(B // seg, seg, W), plain_seg)
            )
            return out.reshape(B, L)

        acc = jnp.bfloat16 if tau <= 256 else jnp.float32

        def one_segment(sw):
            sel = gf2.unpack_bits(sw, tau, dtype=jnp.bfloat16)
            counts = jnp.matmul(sel, pk_bits, preferred_element_type=acc)
            return gf2.parity_pack(counts, L)

        out = jax.lax.map(one_segment, selw.reshape(B // seg, seg, W))
        out = jax.lax.optimization_barrier(out)
        return gf2.xor_const_bit(out.reshape(B, L), plain.astype(U32))

    sel = gf2.unpack_bits(selw, tau, dtype=jnp.bfloat16)
    return _encrypt_core(sel, pk_bits, plain, L)
