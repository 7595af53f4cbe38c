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


class TestCompiledSlimBool:
    """Regression: compiled comparison/equality ops must re-attach the slim
    Ciphered[Bool] metadata (zero_lanes, desc) the jit boundary drops."""

    def test_compile_op2_lessthan_decrypts(self):
        from homomorph_tpu.models import HomomorphicLessThan

        ctx = make_ctx(3, hm.Parameters(128, 16, 1, 16))
        a = ctx.encrypt([10, 200], hm.U8, batch=True)
        b = ctx.encrypt([32, 100], hm.U8, batch=True)
        fn = compile_op2(HomomorphicLessThan, hm.U8, ctx.parameters.pk_degree)
        got = fn(a, b)
        assert len(got) == 8 and got.zero_lanes == 7
        assert got.desc is hm.Bool  # desc follows the op's output type
        assert [bool(v) for v in ctx.decrypt(got)] == [True, False]

    def test_compile_roundtrip_equality_bits(self):
        from homomorph_tpu.models import HomomorphicEquality

        ctx = make_ctx(4, hm.Parameters(128, 16, 1, 16))
        fn = compile_roundtrip(ctx, HomomorphicEquality, hm.U8)
        bits = np.unpackbits(
            np.array([[7], [9]], dtype=np.uint8), axis=1, bitorder="little"
        ).astype(np.uint32)
        bits_b = np.unpackbits(
            np.array([[7], [8]], dtype=np.uint8), axis=1, bitorder="little"
        ).astype(np.uint32)
        out = np.asarray(
            fn(jax.random.key(0), jax.numpy.asarray(bits), jax.numpy.asarray(bits_b))
        )
        assert out.shape[-1] == 8  # full logical byte, implicit lanes padded
        assert list(out[0]) == [1, 0, 0, 0, 0, 0, 0, 0]  # 7 == 7
        assert list(out[1]) == [0, 0, 0, 0, 0, 0, 0, 0]  # 9 != 8
