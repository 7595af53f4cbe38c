"""Golden-vector tests for the GF(2) limb engine.

Ports the reference's hand-computed polynomial vectors
(reference: src/polynomial.rs:428-613) - the primary bit-exactness oracle -
plus randomized fuzz against the big-int oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from homomorph_tpu.gf2 import poly as gf2
from oracle import clmul_int, rem_int


def L(*words):
    return jnp.array(words, dtype=jnp.uint32)


def as_int(limbs) -> int:
    return int.from_bytes(np.asarray(limbs, dtype=np.uint32).tobytes(), "little")


class TestDegree:
    # src/polynomial.rs:439-449 (adapted from 64-bit words to 32-bit limbs)
    def test_compute_degree(self):
        assert int(gf2.compute_degree(L(0b10010))) == 4
        assert int(gf2.compute_degree(L(0b10010, 0b1))) == 32
        assert int(gf2.compute_degree(L(0b10010, 0b0))) == 4

    def test_null_degree_convention(self):
        # null polynomial has degree 0 by convention (src/polynomial.rs:124-137)
        assert int(gf2.compute_degree(L(0, 0, 0))) == 0

    def test_batched(self):
        m = jnp.stack([L(0b10010, 0), L(0, 0b1), L(0, 0)])
        assert list(np.asarray(gf2.compute_degree(m))) == [4, 32, 0]


class TestMonomialRandom:
    # src/polynomial.rs:474-496
    def test_monomial(self):
        assert int(gf2.compute_degree(gf2.monomial(5))) == 5
        assert int(gf2.compute_degree(gf2.monomial(31))) == 31
        assert int(gf2.compute_degree(gf2.monomial(32))) == 32

    def test_random_exact_degree(self):
        from homomorph_tpu.rng import ThreefrySource, random_poly_limbs

        src = ThreefrySource(7)
        for deg in (5, 32, 64, 127, 128):
            limbs = random_poly_limbs(src, deg)
            v = int.from_bytes(limbs.tobytes(), "little")
            assert v.bit_length() - 1 == deg


class TestEvaluate:
    # src/polynomial.rs:511-520
    def test_evaluate(self):
        p = L(0b1001)
        assert int(gf2.evaluate(p, True)) == 0
        assert int(gf2.evaluate(p, False)) == 1
        p = L(0b111100010, 0b1001)
        assert int(gf2.evaluate(p, True)) == 1
        assert int(gf2.evaluate(p, False)) == 0


class TestAdd:
    # src/polynomial.rs:522-535
    def test_simple(self):
        assert as_int(gf2.xor(L(0b1001), L(0b0011))) == 0b1010

    def test_multi_limb(self):
        got = gf2.xor(L(0b1001, 0b1), L(0b0101, 0b1))
        assert list(np.asarray(got)) == [0b1100, 0]

    def test_const_bit(self):
        assert as_int(gf2.xor_const_bit(L(0b1000), 1)) == 0b1001
        assert as_int(gf2.xor_const_bit(L(0b1001), 1)) == 0b1000
        assert as_int(gf2.xor_const_bit(L(0b1001), 0)) == 0b1001


class TestMul:
    # src/polynomial.rs:537-561
    def test_vectors(self):
        assert as_int(gf2.clmul(L(0b1001), L(0b11))) == 0b11011
        assert as_int(gf2.clmul(L(0b111), L(0b11))) == 0b1001
        # Coefficient::MAX * (x+1) = x^64 + 1 (64-bit word = two limbs)
        got = gf2.clmul(L(0xFFFFFFFF, 0xFFFFFFFF), L(0b11))
        assert as_int(got) == (1 << 64) | 1

    def test_null(self):
        assert as_int(gf2.clmul(L(0), L(0b11))) == 0

    def test_fuzz_vs_oracle(self, rng):
        for _ in range(60):
            La, Lb = int(rng.integers(1, 6)), int(rng.integers(1, 6))
            a = rng.integers(0, 2**32, size=La, dtype=np.uint32)
            b = rng.integers(0, 2**32, size=Lb, dtype=np.uint32)
            got = as_int(gf2.clmul(jnp.asarray(a), jnp.asarray(b)))
            ai = int.from_bytes(a.tobytes(), "little")
            bi = int.from_bytes(b.tobytes(), "little")
            assert got == clmul_int(ai, bi)

    def test_chunked_matches(self, rng):
        a = rng.integers(0, 2**32, size=(300, 9), dtype=np.uint32)
        b = rng.integers(0, 2**32, size=(300, 9), dtype=np.uint32)
        full = gf2.clmul(jnp.asarray(a), jnp.asarray(b))
        old_cap = gf2._CLMUL_ELEM_CAP
        try:
            gf2._CLMUL_ELEM_CAP = 4096  # force chunking
            chunked = gf2.clmul_chunked(jnp.asarray(a), jnp.asarray(b))
        finally:
            gf2._CLMUL_ELEM_CAP = old_cap
        assert (np.asarray(full) == np.asarray(chunked)).all()


class TestRem:
    # src/polynomial.rs:563-582
    def test_vectors(self):
        r = gf2.rem_iterative(L(0b1001), L(0b11), 1)
        assert as_int(r) == 0
        r = gf2.rem_iterative(L(0b1), L(0b10), 1)
        assert as_int(r) == 1
        r = gf2.rem_iterative(L(0b1010101101), L(0b11011), 4)
        assert as_int(r) == 0b1010

    def test_linear_matches_iterative(self, rng):
        for _ in range(30):
            Lc = int(rng.integers(1, 5))
            c = rng.integers(0, 2**32, size=Lc, dtype=np.uint32)
            sdeg = int(rng.integers(1, 50))
            s_int = (1 << sdeg) | int(rng.integers(0, 1 << min(sdeg, 30)))
            s = np.frombuffer(s_int.to_bytes(8, "little"), dtype=np.uint32)[
                : sdeg // 32 + 1
            ].copy()
            ci = int.from_bytes(c.tobytes(), "little")
            want = rem_int(ci, s_int)
            it = gf2.rem_iterative(jnp.asarray(c), jnp.asarray(s), sdeg)
            assert as_int(it) == want
            rows = gf2.reduction_rows(jnp.asarray(s), sdeg, Lc * 32)
            lin = gf2.rem_linear(jnp.asarray(c), rows)
            assert as_int(lin) == want

    def test_decrypt_mask_matches_rem_bit0(self, rng):
        sdeg = 33
        s_int = (1 << sdeg) | int(rng.integers(0, 1 << 30))
        s = np.frombuffer(s_int.to_bytes(8, "little"), dtype=np.uint32).copy()
        w = gf2.decrypt_mask(jnp.asarray(s), sdeg, 4)
        c = rng.integers(0, 2**32, size=(64, 4), dtype=np.uint32)
        got = np.asarray(gf2.decipher_bits(jnp.asarray(c), w))
        for i in range(64):
            ci = int.from_bytes(c[i].tobytes(), "little")
            assert int(got[i]) == (rem_int(ci, s_int) & 1)


class TestPackUnpack:
    def test_roundtrip(self, rng):
        x = rng.integers(0, 2**32, size=(3, 7), dtype=np.uint32)
        bits = gf2.unpack_bits(jnp.asarray(x), 7 * 32)
        back = gf2.pack_bits(bits)
        assert (np.asarray(back) == x).all()

    def test_partial_bits(self):
        x = L(0xFFFFFFFF)
        bits = gf2.unpack_bits(x, 5)
        assert list(np.asarray(bits)) == [1, 1, 1, 1, 1]
        packed = gf2.pack_bits(bits)
        assert as_int(packed) == 0b11111


class TestByteConversion:
    # src/polynomial.rs:606-612
    def test_roundtrip(self):
        limbs = np.array([0b1001, 0b1000001101011010, 0, 1, 0], dtype=np.uint32)
        data = gf2.limbs_to_bytes(limbs)
        back = gf2.limbs_from_bytes(data)
        assert (back == limbs).all()

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            gf2.limbs_from_bytes(b"")

    def test_unaligned_length(self):
        back = gf2.limbs_from_bytes(bytes([5, 14, 8]))
        assert back.size == 1 and int(back[0]) == 5 | (14 << 8) | (8 << 16)


class TestShifts:
    def test_static_vs_dynamic(self, rng):
        x = rng.integers(0, 2**32, size=4, dtype=np.uint32)
        xi = int.from_bytes(x.tobytes(), "little")
        for k in (0, 1, 31, 32, 33, 64, 100):
            out_l = 8
            want = (xi << k) & ((1 << (out_l * 32)) - 1)
            st = gf2.shift_left_static(jnp.asarray(x), k, out_l)
            dy = gf2.shift_left_dynamic(jnp.asarray(x), jnp.int32(k), out_l)
            assert as_int(st) == want, f"static k={k}"
            assert as_int(dy) == want, f"dynamic k={k}"


class TestKernelDispatchClmul:
    """Fuzz homomorph_tpu.gf2.kernels.clmul across its dispatch regimes.

    The dispatcher picks between Karatsuba splitting (balanced >= 64-limb
    operands), big-operand chunking (unbalanced large x large), strips, and
    the jnp base case on static shapes only, so the CPU suite exercises the
    same decomposition graph that runs on TPU.
    """

    SIZES = [
        (64, 64),    # Karatsuba at the threshold
        (65, 64),    # odd split
        (96, 96),    # one level, base 48 (kernel cap)
        (64, 96),    # balanced-enough (Lg = 1.5 Ls)
        (64, 160),   # chunk path: 160 -> 64 + 64 + 32 pieces
        (384, 384),  # three Karatsuba levels
        (256, 384),  # chunk then Karatsuba
        (5, 384),    # small x large (strip/jnp base)
    ]

    def test_fuzz_vs_oracle(self, rng, monkeypatch):
        from homomorph_tpu.gf2 import kernels as gf2k

        # Karatsuba is gated to TPU backends (XLA:CPU compile cost);
        # force it here so the CPU suite covers the decomposition graph.
        monkeypatch.setattr(gf2k, "FORCE_KARATSUBA", True)
        for La, Lb in self.SIZES:
            a = rng.integers(0, 2**32, size=(3, La), dtype=np.uint32)
            b = rng.integers(0, 2**32, size=(3, Lb), dtype=np.uint32)
            got = gf2k.clmul(jnp.asarray(a), jnp.asarray(b))
            assert got.shape == (3, La + Lb)
            for i in range(3):
                ai = int.from_bytes(a[i].tobytes(), "little")
                bi = int.from_bytes(b[i].tobytes(), "little")
                gi = int.from_bytes(np.asarray(got[i]).tobytes(), "little")
                assert gi == clmul_int(ai, bi), (La, Lb, i)

    def test_scalar_lead(self, rng, monkeypatch):
        from homomorph_tpu.gf2 import kernels as gf2k

        monkeypatch.setattr(gf2k, "FORCE_KARATSUBA", True)
        a = rng.integers(0, 2**32, size=70, dtype=np.uint32)
        b = rng.integers(0, 2**32, size=66, dtype=np.uint32)
        got = gf2k.clmul(jnp.asarray(a), jnp.asarray(b))
        assert got.shape == (136,)
        gi = int.from_bytes(np.asarray(got).tobytes(), "little")
        ai = int.from_bytes(a.tobytes(), "little")
        bi = int.from_bytes(b.tobytes(), "little")
        assert gi == clmul_int(ai, bi)
