"""Cipher layer tests (reference: src/cipher.rs:261-320)."""

import dataclasses

import numpy as np
import pytest

import homomorph_tpu as hm


@pytest.fixture(scope="module")
def ctx():
    c = hm.Context(hm.Parameters(64, 32, 8, 32), source=hm.ThreefrySource(21))
    c.generate_secret_key()
    c.generate_public_key()
    return c


class TestCipher:
    # src/cipher.rs:275-304
    def test_u8_roundtrip(self, ctx):
        c = ctx.encrypt(2, hm.U8)
        assert len(c) == 8
        assert ctx.decrypt(c) == 2

    def test_usize_max_roundtrip(self, ctx):
        v = (1 << 64) - 1
        c = ctx.encrypt(v, hm.Usize)
        assert len(c) == 64
        assert ctx.decrypt(c) == v

    def test_struct_roundtrip(self, ctx):
        @dataclasses.dataclass
        class MyStruct:
            a: np.uint32
            b: np.uint32

        desc = hm.struct_of(MyStruct)
        data = MyStruct(np.uint32(42), np.uint32(69))
        c = ctx.encrypt(data, desc)
        assert len(c) == 64  # 8 * sizeof
        out = ctx.decrypt(c)
        assert (out.a, out.b) == (42, 69)

    def test_all_widths(self, ctx):
        cases = [
            (hm.U16, 0xBEEF), (hm.U32, 0xDEADBEEF),
            (hm.U64, (1 << 63) | 12345), (hm.U128, (1 << 127) | 99),
            (hm.I8, -128), (hm.I16, -32768), (hm.I32, -1),
            (hm.I64, -(1 << 62)), (hm.I128, -(1 << 100)),
            (hm.Bool, True), (hm.Bool, False),
            (hm.F32, 1.5), (hm.F64, -3.25),
        ]
        for desc, v in cases:
            c = ctx.encrypt(v, desc)
            assert len(c) == desc.num_bits
            assert ctx.decrypt(c) == v, desc.name

    def test_batch_roundtrip(self, ctx, rng):
        vals = [int(v) for v in rng.integers(0, 2**32, size=16)]
        c = ctx.encrypt(vals, hm.U32, batch=True)
        assert c.batch_shape == (16,)
        out = ctx.decrypt(c)
        assert list(out) == vals

    def test_randomized_ciphertexts_differ(self, ctx):
        a = ctx.encrypt(7, hm.U8)
        b = ctx.encrypt(7, hm.U8)
        assert not (np.asarray(a.limbs) == np.asarray(b.limbs)).all()
        assert ctx.decrypt(a) == ctx.decrypt(b) == 7

    def test_trivial_bits_decrypt_blindly(self, ctx):
        # zero()/one() usable as if ciphered (src/cipher.rs:33-51)
        sk = ctx.get_secret_key()
        assert int(hm.CipheredBit.zero().decipher(sk)) == 0
        assert int(hm.CipheredBit.one().decipher(sk)) == 1


class TestDeref:
    # src/cipher.rs:306-319
    def test_bit_access(self, ctx):
        c = ctx.encrypt(0b10001010, hm.U8)
        bits = c.bits()
        assert len(bits) == 8
        lo, hi = c.split_at(4)
        assert len(lo) == 4 and len(hi) == 4
        rebuilt = hm.Ciphered.new_from_raw(lo + hi, hm.U8)
        assert ctx.decrypt(rebuilt) == 0b10001010

    def test_reinterpret(self, ctx):
        c = ctx.encrypt(0x1234, hm.U16)
        as_i16 = c.reinterpret(hm.I16)
        assert ctx.decrypt(as_i16) == 0x1234


class TestErrors:
    def test_invalid_length(self, ctx):
        c = ctx.encrypt(7, hm.U8)
        bad = hm.Ciphered.new_from_raw(c.bits()[:5], hm.U8)
        with pytest.raises(hm.InvalidCipheredLengthError):
            bad.decipher(ctx.get_secret_key())

    def test_python_int_needs_descriptor(self, ctx):
        with pytest.raises(TypeError):
            ctx.encrypt(5)

    def test_numpy_scalar_inferred(self, ctx):
        c = ctx.encrypt(np.uint16(500))
        assert len(c) == 16
        assert ctx.decrypt(c) == 500


class TestCiphertextSerialization:
    def test_roundtrip(self, ctx):
        c = ctx.encrypt(190, hm.U8)
        c2 = hm.Ciphered.from_bytes(c.to_bytes(), hm.U8)
        assert ctx.decrypt(c2) == 190

    def test_batch_roundtrip(self, ctx):
        c = ctx.encrypt([1, 2, 3], hm.U16, batch=True)
        c2 = hm.Ciphered.from_bytes(c.to_bytes(), hm.U16)
        assert list(ctx.decrypt(c2)) == [1, 2, 3]


class TestCiphertextHeaderValidation:
    """Ciphered.from_bytes treats the buffer as untrusted (review finding)."""

    @staticmethod
    def _head(n_bits, zero_lanes, L, bound, rank):
        import numpy as np

        import homomorph_tpu as hm

        return np.array(
            [hm.Ciphered.WIRE_MAGIC, hm.Ciphered.WIRE_VERSION,
             n_bits, zero_lanes, L, bound, 2, rank],  # 2 = fresh noise (v2)
            dtype="<u4",
        ).tobytes()

    def test_truncated_and_corrupt_headers(self):
        import homomorph_tpu as hm

        for bad in (b"", b"\x00" * 7, b"\x00" * 27):
            with pytest.raises(hm.DeserializeError):
                hm.Ciphered.from_bytes(bad, hm.U8)
        zero_dims = self._head(0, 0, 0, 0, 0)
        with pytest.raises(hm.DeserializeError, match="corrupt"):
            hm.Ciphered.from_bytes(zero_dims, hm.U8)

    def test_body_size_mismatch(self):
        import homomorph_tpu as hm

        head = self._head(8, 0, 3, 96, 0)
        with pytest.raises(hm.DeserializeError, match="implies"):
            hm.Ciphered.from_bytes(head + b"\x00" * 20, hm.U8)

    def test_desc_width_mismatch(self):
        import homomorph_tpu as hm

        head = self._head(8, 0, 1, 0, 0)
        body = b"\x00" * (8 * 1 * 4)
        ok = hm.Ciphered.from_bytes(head + body, hm.U8)
        assert len(ok) == 8
        with pytest.raises(hm.DeserializeError, match="bit lanes"):
            hm.Ciphered.from_bytes(head + body, hm.U16)
