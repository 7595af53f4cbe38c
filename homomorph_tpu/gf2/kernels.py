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
        for j in range(Lb):  # static unroll over the small operand
            bj = b_ref[j, :][None, :]  # [1, TB]
            lo = jnp.where(sel, bj << k32, U32(0))
            hi = jnp.where(sel, (bj >> 1) >> (U32(31) - k32), U32(0))
            o_ref[j : j + La, :] ^= lo
            o_ref[j + 1 : j + 1 + La, :] ^= hi
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


def clmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched carry-less multiply with Pallas fast path.

    Same contract as :func:`homomorph_tpu.gf2.poly.clmul`: [..., La] x
    [..., Lb] -> [..., La+Lb] with broadcast leading dims.

    Large x large products (both operands beyond the kernel's unroll cap)
    are decomposed into 32-limb strips of the smaller operand: each strip
    runs the small x large kernel, and strip results combine with
    static-offset XORs - total limb work is unchanged.
    """
    La, Lb = a.shape[-1], b.shape[-1]
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    batch = int(np.prod(lead)) if lead else 1

    small, big = (a, b) if La <= Lb else (b, a)
    Ls, Lg = small.shape[-1], big.shape[-1]

    if not _kernel_enabled() or batch < LANES or (Ls + Lg) > _MAX_TOTAL_LIMBS:
        return gf2.clmul_chunked(a, b)

    af = jnp.broadcast_to(big, lead + (Lg,)).reshape(batch, Lg)
    bf = jnp.broadcast_to(small, lead + (Ls,)).reshape(batch, Ls)
    pad = (-batch) % LANES
    if pad:
        af = jnp.pad(af, [(0, pad), (0, 0)])
        bf = jnp.pad(bf, [(0, pad), (0, 0)])

    if Ls <= _MAX_SMALL_LIMBS:
        outT = _clmul_pallas_T(af.T, bf.T, Lg, Ls)
        out = outT.T[:batch]
        return out.reshape(lead + (Lg + Ls,))

    # strip decomposition over the smaller operand
    aT = af.T
    acc = jnp.zeros((Lg + Ls, af.shape[0]), dtype=jnp.uint32)
    for c0 in range(0, Ls, _STRIP):
        w = min(_STRIP, Ls - c0)
        stripT = bf[:, c0 : c0 + w].T
        prodT = _clmul_pallas_T(aT, stripT, Lg, w)  # [Lg + w, B]
        acc = acc.at[c0 : c0 + Lg + w, :].set(
            acc[c0 : c0 + Lg + w, :] ^ prodT
        )
    out = acc.T[:batch]
    return out.reshape(lead + (Lg + Ls,))
