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

Integration: :func:`set_default_limb_mesh` registers a mesh; the central
clmul dispatcher (:func:`homomorph_tpu.gf2.kernels.clmul`) then routes
sufficiently large, unbalanced products (the adder/multiplier carry chains
and the decrypt remainder at scaled degrees, where a small fixed operand
multiplies a growing one - reference hot loop shape at
src/polynomial.rs:252-310) through :func:`sharded_clmul` automatically.
Comm volume per call: ``(n_shards - 1) * B * Lb * 4`` bytes, one hop each.
"""

from __future__ import annotations

import functools
import os
import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gf2 import kernels as gf2k
from ..gf2 import poly as gf2

__all__ = [
    "sharded_clmul",
    "maybe_sharded_clmul",
    "set_default_limb_mesh",
    "get_default_limb_mesh",
    "use_limb_mesh",
    "comm_bytes_per_call",
    "LIMB_AXIS",
]

LIMB_AXIS = "limb"

# Minimum per-shard block (limbs of the big operand) before sharding pays:
# below this the boundary exchange dominates the local product.
_SHARD_MIN_BLOCK = int(os.environ.get("HOMOMORPH_TPU_SHARD_MIN_BLOCK", "64"))

_tls = threading.local()
_DEFAULT_MESH: Mesh | None = None
_DEFAULT_AXIS: str = LIMB_AXIS


def set_default_limb_mesh(mesh: Mesh | None, axis: str = LIMB_AXIS) -> None:
    """Register (or clear, with ``None``) the mesh the clmul dispatcher uses
    for automatic limb-sharding of large unbalanced products.

    TRACE-TIME knob: the dispatcher consults the registry while a circuit
    is being traced, so functions already jit-compiled keep whatever
    routing they were traced with - register the mesh before the first
    call of the circuits you want routed (same semantics as the
    HOMOMORPH_TPU_CARRY_SCAN snapshot in models/circuits.py)."""
    global _DEFAULT_MESH, _DEFAULT_AXIS
    if mesh is not None and axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r}; axes: {tuple(mesh.shape)}")
    _DEFAULT_MESH = mesh
    _DEFAULT_AXIS = axis


def get_default_limb_mesh() -> tuple[Mesh | None, str]:
    return _DEFAULT_MESH, _DEFAULT_AXIS


@contextmanager
def use_limb_mesh(mesh: Mesh | None, axis: str = LIMB_AXIS):
    """Scoped :func:`set_default_limb_mesh`."""
    prev = (_DEFAULT_MESH, _DEFAULT_AXIS)
    set_default_limb_mesh(mesh, axis)
    try:
        yield
    finally:
        set_default_limb_mesh(*prev)


@contextmanager
def suppress_sharded_clmul():
    """Keep :func:`maybe_sharded_clmul` inert for the enclosed trace.

    Used by code that is ALREADY inside a manual-sharding region (the
    ``shard_map`` bodies of :mod:`homomorph_tpu.parallel.bulk` and this
    module's own local block): nesting a second ``shard_map`` over a
    different mesh inside one fails at trace time."""
    prev = getattr(_tls, "inside", False)
    _tls.inside = True
    try:
        yield
    finally:
        _tls.inside = prev


def comm_bytes_per_call(batch: int, small_limbs: int, n_shards: int) -> int:
    """ICI bytes moved by one :func:`sharded_clmul`: each of the
    ``n_shards - 1`` boundary hops carries the ``Lb``-limb spill for the
    whole batch, 4 bytes per uint32 limb."""
    return (n_shards - 1) * batch * small_limbs * 4


def _local_block(a_blk: jax.Array, b: jax.Array, n_shards: int, axis: str):
    """Per-shard body: local product + one-hop boundary spill exchange."""
    K = a_blk.shape[-1]
    Lb = b.shape[-1]
    with suppress_sharded_clmul():  # keep the inner clmul off this path
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


def _is_tracing(*arrays) -> bool:
    return any(isinstance(x, jax.core.Tracer) for x in arrays)


def sharded_clmul(
    a: jax.Array, b: jax.Array, mesh: Mesh, axis: str = LIMB_AXIS
) -> jax.Array:
    """Carry-less multiply with ``a``'s limb axis sharded over ``mesh[axis]``.

    ``a``: [B, La] (the large operand), ``b``: [B, Lb] replicated small
    operand.  Returns [B, La + Lb] limbs (sharded over the limb axis when
    called untraced).  The per-shard block (after padding) is >= Lb limbs,
    so the spill never crosses more than one shard boundary; real data
    cannot spill past the padded end (``n*K >= La + Lb`` bounds the top
    product limb strictly below ``n*K``).

    Trace-safe: under an outer ``jit`` the explicit placement is skipped
    and ``shard_map`` reshards its inputs itself.
    """
    n = mesh.shape[axis]
    La, Lb = a.shape[-1], b.shape[-1]
    out_len = La + Lb
    # pad the output length to a multiple of n, at least Lb per shard
    K = max(-(-out_len // n), Lb)
    a_pad = gf2.pad_limbs(a, K * n)
    if not _is_tracing(a_pad, b):
        a_pad = jax.device_put(a_pad, NamedSharding(mesh, P(None, axis)))
        b = jax.device_put(b, NamedSharding(mesh, P(None, None)))
    out = _sharded_clmul(a_pad, b, mesh, axis)
    return out[..., :out_len]


def maybe_sharded_clmul(a: jax.Array, b: jax.Array):
    """Route ``a * b`` through :func:`sharded_clmul` when it qualifies.

    Returns ``None`` (caller falls back to the dense dispatcher) unless a
    default limb mesh is registered, we are not already inside a sharded
    local block, and the product is large and unbalanced enough that each
    shard gets a full-size block: ``Lg // n >= max(Ls, _SHARD_MIN_BLOCK)``.
    Leading batch dims are flattened to the [B, L] contract and restored.
    """
    mesh, axis = _DEFAULT_MESH, _DEFAULT_AXIS
    if mesh is None or getattr(_tls, "inside", False):
        return None
    n = mesh.shape[axis]
    if n < 2:
        return None
    La, Lb = a.shape[-1], b.shape[-1]
    big, small = (a, b) if La >= Lb else (b, a)
    Lg, Ls = big.shape[-1], small.shape[-1]
    if Lg // n < max(Ls, _SHARD_MIN_BLOCK):
        return None
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    batch = int(np.prod(lead)) if lead else 1
    bf = jnp.broadcast_to(big, lead + (Lg,)).reshape(batch, Lg)
    sf = jnp.broadcast_to(small, lead + (Ls,)).reshape(batch, Ls)
    out = sharded_clmul(bf, sf, mesh, axis)
    return out.reshape(lead + (Lg + Ls,))
