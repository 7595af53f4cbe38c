"""Precompiled homomorphic pipelines for serving.

The circuit library executes gate-by-gate (eager dispatch per op).  For
production serving, whole pipelines should be one compiled XLA program:
this module closes an operation (or a full encrypt -> op -> decrypt chain)
over static shapes and jits it once, so repeated calls pay a single device
dispatch regardless of circuit depth.

The reference has no such layer (every op is a direct function call,
src/context.rs:496-546); on TPU the distinction is the difference between
hundreds of device round-trips and one.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

from .. import codec as _codec
from ..cipher import FRESH_NOISE, Ciphered
from ..context import Context
from ..gf2 import poly as gf2
from ..keys import PublicKey, SecretKey
from ..params import Parameters

__all__ = ["compile_op2", "compile_op1", "compile_roundtrip"]


def _derive_meta(
    apply_fn, bound: int, desc, *abstract_limbs, noise: int = FRESH_NOISE
) -> dict:
    """Output metadata (degree bound, zero_lanes, descriptor) of an
    operation, derived by an abstract trace.

    ``bound`` is a trace-time Python value, so it cannot be returned from
    a jitted function; ``jax.eval_shape`` traces the op abstractly RIGHT
    NOW (never cached, no device work), which makes capturing the Python-
    level bound sound regardless of future jit retracing behaviour.
    """
    meta = {}

    def probe(*limbs):
        args = [Ciphered(x, bound, desc, noise=noise) for x in limbs]
        out = apply_fn(*args)
        meta["bound"] = out.bound
        meta["zero_lanes"] = out.zero_lanes
        meta["desc"] = out.desc
        meta["noise"] = out.noise
        return out.limbs

    jax.eval_shape(probe, *abstract_limbs)
    return meta


def compile_op2(
    op, desc: _codec.TypeDescriptor, bound: int, noise: int = FRESH_NOISE
) -> Callable[[Ciphered, Ciphered], Ciphered]:
    """Compile a binary operation into one XLA program.

    ``bound`` is the operands' degree bound (``params.pk_degree`` for
    fresh ciphertexts) and ``noise`` their tracked noise bound (fresh by
    default; pass the composed value when the pipeline consumes circuit
    outputs).  Shapes specialize on first call per batch shape.
    """
    out_meta = {}

    @jax.jit
    def run(a_limbs, b_limbs):
        a = Ciphered(a_limbs, bound, desc, noise=noise)
        b = Ciphered(b_limbs, bound, desc, noise=noise)
        return op.unsafe_apply(a, b).limbs

    def call(a: Ciphered, b: Ciphered) -> Ciphered:
        # the compiled program was specialized on the declared operand
        # noise; noisier operands would get an understated output stamp,
        # silently weakening the checked envelope downstream
        if a.noise > noise or b.noise > noise:
            raise ValueError(
                f"operand noise ({a.noise}, {b.noise}) exceeds the "
                f"compiled declaration ({noise}); recompile with "
                f"noise={max(a.noise, b.noise)}"
            )
        if not out_meta:
            out_meta.update(
                _derive_meta(op.unsafe_apply, bound, desc, a.limbs, b.limbs,
                             noise=noise)
            )
        # re-attach the trace-time metadata: comparison/equality ops return
        # the slim Ciphered[Bool] layout (zero_lanes=7) and a Bool desc -
        # dropping either makes the result undecryptable/mistyped; the
        # noise bound keeps the checked API sound downstream
        return Ciphered(
            run(a.limbs, b.limbs),
            out_meta["bound"],
            out_meta["desc"],
            zero_lanes=out_meta["zero_lanes"],
            noise=out_meta["noise"],
        )

    return call


def compile_op1(
    op, desc: _codec.TypeDescriptor, bound: int, noise: int = FRESH_NOISE
) -> Callable[[Ciphered], Ciphered]:
    out_meta = {}

    @jax.jit
    def run(a_limbs):
        a = Ciphered(a_limbs, bound, desc, noise=noise)
        return op.unsafe_apply(a).limbs

    def call(a: Ciphered) -> Ciphered:
        if a.noise > noise:
            raise ValueError(
                f"operand noise ({a.noise}) exceeds the compiled "
                f"declaration ({noise}); recompile with noise={a.noise}"
            )
        if not out_meta:
            out_meta.update(
                _derive_meta(op.unsafe_apply, bound, desc, a.limbs,
                             noise=noise)
            )
        return Ciphered(
            run(a.limbs),
            out_meta["bound"],
            out_meta["desc"],
            zero_lanes=out_meta["zero_lanes"],
            noise=out_meta["noise"],
        )

    return call


def compile_roundtrip(
    ctx: Context, op, desc: _codec.TypeDescriptor
) -> Callable:
    """Compile encrypt(a), encrypt(b) -> op -> decrypt-bits as ONE program.

    Returns ``f(key, bits_a, bits_b) -> plain_bits`` where ``bits_*`` are
    [batch, n_bits] plaintext bits and the result is the decrypted output
    bits of ``op`` - the full pipeline in a single device dispatch
    (keys must already be generated on ``ctx``).
    """
    pk: PublicKey = ctx.get_public_key()
    sk: SecretKey = ctx.get_secret_key()
    if pk is None or sk is None:
        raise ValueError("context needs both keys")
    params: Parameters = ctx.parameters
    if desc.is_fixed_size:
        # validate with the statically-known operand width so width-aware
        # requirements (requirement_for) apply, not the blanket constant
        class _Lanes:
            noise = FRESH_NOISE  # compile_roundtrip encrypts fresh inputs

            def __len__(self):
                return desc.num_bits

        ctx.validate_operation(op, _Lanes(), _Lanes())
    else:
        ctx.validate_operation(op)
    bound = pk.max_degree
    L = gf2.limbs_for(bound)
    pk_bits = pk.bit_planes()
    tau = params.tau
    meta = {}

    from ..cipher import _encrypt_core, _random_selection

    @functools.partial(jax.jit)
    def run(key, bits_a, bits_b, w):
        import jax.numpy as jnp

        ka, kb = jax.random.split(key)
        sel_a = _random_selection(ka, tuple(bits_a.shape), tau)
        sel_b = _random_selection(kb, tuple(bits_b.shape), tau)
        a = Ciphered(_encrypt_core(sel_a, pk_bits, bits_a, L), bound, desc)
        b = Ciphered(_encrypt_core(sel_b, pk_bits, bits_b, L), bound, desc)
        out = op.unsafe_apply(a, b)
        bits = gf2.decipher_bits(out.limbs, w)
        if out.zero_lanes:  # slim bool layout: implicit lanes decrypt to 0
            bits = jnp.concatenate(
                [bits, jnp.zeros(bits.shape[:-1] + (out.zero_lanes,), bits.dtype)],
                axis=-1,
            )
        return bits

    def call(key, bits_a, bits_b):
        # abstract-trace once to learn the output degree class, then reuse
        if "L" not in meta:
            def probe(key, ba, bb):
                ka, kb = jax.random.split(key)
                sel_a = _random_selection(ka, tuple(ba.shape), tau)
                sel_b = _random_selection(kb, tuple(bb.shape), tau)
                a = Ciphered(_encrypt_core(sel_a, pk_bits, ba, L), bound, desc)
                b = Ciphered(_encrypt_core(sel_b, pk_bits, bb, L), bound, desc)
                return op.unsafe_apply(a, b).limbs

            shp = jax.eval_shape(probe, key, bits_a, bits_b)
            meta["L"] = shp.shape[-1]
        w = sk.decrypt_mask(meta["L"])
        return run(key, bits_a, bits_b, w)

    return call
