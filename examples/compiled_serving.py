"""Serving with precompiled pipelines: whole encrypt->op->decrypt chains
as ONE XLA program per shape.

The eager circuit API dispatches gate-by-gate; for production serving,
``models.compiled`` closes a pipeline over static shapes so repeated calls
pay a single device dispatch (the reference has no such layer - every op
is a direct call, src/context.rs:496-546; on TPU this is the difference
between hundreds of device round-trips and one).

Run directly (asserts like the reference's examples) or via the test
suite (tests/test_examples.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import homomorph_tpu as hm
from homomorph_tpu.models import (
    HomomorphicAddition,
    HomomorphicLessThan,
)
from homomorph_tpu.models.compiled import compile_op2, compile_roundtrip


def main() -> None:
    ctx = hm.Context(hm.Parameters(128, 16, 1, 16), encrypt_seed=7)
    ctx.generate_secret_key()
    ctx.generate_public_key()

    # --- compiled binary op: ciphertexts in, ciphertext out ---------------
    add = compile_op2(HomomorphicAddition, hm.U8, ctx.parameters.pk_degree)
    a = ctx.encrypt([10, 250], hm.U8, batch=True)
    b = ctx.encrypt([32, 10], hm.U8, batch=True)
    s = add(a, b)  # one dispatch, shapes cached across calls
    assert [int(v) for v in ctx.decrypt(s)] == [42, (250 + 10) & 0xFF]

    # comparison results come back in the slim Ciphered[Bool] layout
    less = compile_op2(HomomorphicLessThan, hm.U8, ctx.parameters.pk_degree)
    r = less(a, b)
    assert r.zero_lanes == 7 and len(r) == 8
    assert [bool(v) for v in ctx.decrypt(r)] == [True, False]

    # --- whole pipeline: encrypt -> op -> decrypt in ONE program ----------
    pipe = compile_roundtrip(ctx, HomomorphicAddition, hm.U8)
    xs = np.array([[6], [200]], dtype=np.uint8)
    ys = np.array([[7], [99]], dtype=np.uint8)
    bits_x = np.unpackbits(xs, axis=1, bitorder="little").astype(np.uint32)
    bits_y = np.unpackbits(ys, axis=1, bitorder="little").astype(np.uint32)
    out_bits = np.asarray(pipe(jax.random.key(0), bits_x, bits_y))
    out = np.packbits(out_bits.astype(np.uint8), axis=1, bitorder="little")
    assert list(out[:, 0]) == [13, (200 + 99) & 0xFF]

    # --- key lifecycle ----------------------------------------------------
    ctx.zeroize()  # scrub sk + caches; context reusable after fresh keygen
    assert ctx.get_secret_key() is None and ctx.get_public_key() is None

    print("compiled_serving: OK")


if __name__ == "__main__":
    main()
