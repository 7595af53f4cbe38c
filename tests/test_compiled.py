"""Precompiled pipelines (models/compiled.py): correctness + bound derivation."""

import jax
import numpy as np

import homomorph_tpu as hm
from homomorph_tpu.models import (
    HomomorphicAddition,
    HomomorphicNegation,
    circuits,
)
from homomorph_tpu.models.compiled import compile_op1, compile_op2, compile_roundtrip


def make_ctx(seed=0, params=None):
    ctx = hm.Context(
        params or hm.Parameters(64, 16, 1, 16), source=hm.ThreefrySource(seed)
    )
    ctx.generate_secret_key()
    ctx.generate_public_key()
    return ctx


class TestCompiledOps:
    def test_compile_op2_matches_eager(self):
        ctx = make_ctx(1)
        a = ctx.encrypt([10, 200], hm.U8, batch=True)
        b = ctx.encrypt([32, 100], hm.U8, batch=True)
        fn = compile_op2(HomomorphicAddition, hm.U8, ctx.parameters.pk_degree)
        got = fn(a, b)
        want = circuits.add(a, b)
        # identical ciphertext limbs AND identical derived bound
        np.testing.assert_array_equal(np.asarray(got.limbs), np.asarray(want.limbs))
        assert got.bound == want.bound
        assert [int(v) for v in ctx.decrypt(got)] == [42, (200 + 100) & 0xFF]

    def test_compile_op2_reuse_across_calls(self):
        ctx = make_ctx(2)
        fn = compile_op2(HomomorphicAddition, hm.U8, ctx.parameters.pk_degree)
        for x, y in [(1, 2), (250, 10), (0, 0)]:
            a, b = ctx.encrypt(x, hm.U8), ctx.encrypt(y, hm.U8)
            assert int(ctx.decrypt(fn(a, b))) == (x + y) & 0xFF

    def test_compile_op1(self):
        ctx = make_ctx(3)
        fn = compile_op1(HomomorphicNegation, hm.I8, ctx.parameters.pk_degree)
        a = ctx.encrypt([-5, 42], hm.I8, batch=True)
        got = fn(a)
        assert got.bound == circuits.neg(a).bound
        assert [int(v) for v in ctx.decrypt(got)] == [5, -42]

    def test_compile_roundtrip_single_dispatch(self):
        ctx = make_ctx(4)
        fn = compile_roundtrip(ctx, HomomorphicAddition, hm.U8)
        rng = np.random.default_rng(0)
        xs = rng.integers(0, 128, size=4).astype(np.uint8)
        ys = rng.integers(0, 127, size=4).astype(np.uint8)
        bits_a = np.unpackbits(xs[:, None], axis=1, bitorder="little").astype(np.uint32)
        bits_b = np.unpackbits(ys[:, None], axis=1, bitorder="little").astype(np.uint32)
        out = fn(jax.random.key(9), bits_a, bits_b)
        got = np.packbits(
            np.asarray(out, dtype=np.uint8), axis=1, bitorder="little"
        ).reshape(-1)
        assert (got == xs + ys).all()
