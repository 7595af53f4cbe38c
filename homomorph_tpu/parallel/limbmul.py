"""Limb-sharded carry-less polynomial multiplication.

The sequence-parallelism analogue for this domain (SURVEY §5.7/§7): when
ciphertext polynomials grow too large for one chip's VMEM/HBM budget (deep
AND circuits at d=dp=1024+), shard the LARGE operand's limb axis across the
mesh.  Each shard multiplies its contiguous limb block by the (replicated)
small operand, producing a block that overhangs its neighbour's region by
``Lb`` limbs; the overhang ("spill") is passed one hop right over ICI with
``lax.ppermute`` and XORed into the neighbour's head.

Communication per shard is just the ``Lb``-limb boundary - O(small
operand), independent of the sharded length - instead of an
all-reduce of the whole product.  Note an arithmetic ``psum`` canNOT
combine packed-limb partial products (XOR != +); the boundary exchange
stays entirely in the packed GF(2) domain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gf2 import kernels as gf2k
from ..gf2 import poly as gf2

__all__ = ["sharded_clmul", "LIMB_AXIS"]

LIMB_AXIS = "limb"


def _local_block(a_blk: jax.Array, b: jax.Array, n_shards: int, axis: str):
    """Per-shard body: local product + one-hop boundary spill exchange."""
    K = a_blk.shape[-1]
    Lb = b.shape[-1]
    prod = gf2k.clmul(a_blk, b)  # [..., K + Lb]
    head, spill = prod[..., :K], prod[..., K:]
    # send my spill one shard to the right; shard 0 receives zeros
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    incoming = lax.ppermute(spill, axis, perm)
    return head ^ gf2.pad_limbs(incoming, K)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _sharded_clmul(a_pad: jax.Array, b: jax.Array, mesh: Mesh, axis: str):
    n = mesh.shape[axis]
    fn = jax.shard_map(
        functools.partial(_local_block, n_shards=n, axis=axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None)),
        out_specs=P(None, axis),
    )
    return fn(a_pad, b)


def sharded_clmul(
    a: jax.Array, b: jax.Array, mesh: Mesh, axis: str = LIMB_AXIS
) -> jax.Array:
    """Carry-less multiply with ``a``'s limb axis sharded over ``mesh[axis]``.

    ``a``: [B, La] (the large operand), ``b``: [B, Lb] replicated small
    operand.  Returns [B, La + Lb] limbs, sharded over the limb axis.
    Requires the per-shard block (after padding) to be >= Lb limbs so the
    spill never crosses more than one shard boundary.
    """
    n = mesh.shape[axis]
    La, Lb = a.shape[-1], b.shape[-1]
    out_len = La + Lb
    # pad the output length to a multiple of n, at least Lb per shard
    K = max(-(-out_len // n), Lb)
    a_pad = gf2.pad_limbs(a, K * n)
    a_pad = jax.device_put(a_pad, NamedSharding(mesh, P(None, axis)))
    b = jax.device_put(b, NamedSharding(mesh, P(None, None)))
    out = _sharded_clmul(a_pad, b, mesh, axis)
    return out[..., :out_len]
