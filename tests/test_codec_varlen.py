"""Variable-length plaintext types (bincode 2 fixint wire format).

The reference's ``Ciphered<T>`` covers any bincode-encodable ``T`` -
including ``Vec``/``String``/``Option``/enums - which is exactly why the
``MAX_DECODE_BYTES`` decode-bomb cap exists (reference: src/cipher.rs:15,
239-247).  These tests pin the wire format (length prefixes as u64 LE,
Option tag byte, u32 LE enum discriminant - bincode 2 fixint rules), the
end-to-end encrypt/decrypt round-trips, and the decode-bomb guards that
make the cap load-bearing.
"""

import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu import codec
from homomorph_tpu.cipher import Ciphered


def make_ctx(seed=0):
    ctx = hm.Context(hm.Parameters(64, 32, 8, 32), source=hm.ThreefrySource(seed))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    return ctx


class TestWireFormat:
    """Exact bytes, per bincode 2 fixint (little-endian) rules."""

    def test_vec_u8(self):
        d = hm.vec_of(hm.U8)
        assert d.encode([1, 2, 3]) == bytes([3, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3])
        assert d.decode(bytes([3] + [0] * 7 + [1, 2, 3])) == [1, 2, 3]
        assert d.encode([]) == bytes(8)
        assert d.decode(bytes(8)) == []

    def test_vec_u32(self):
        d = hm.vec_of(hm.U32)
        assert d.encode([258]) == bytes([1] + [0] * 7) + bytes([2, 1, 0, 0])

    def test_string(self):
        assert hm.Str.encode("hi") == bytes([2] + [0] * 7) + b"hi"
        assert hm.Str.decode(bytes([2] + [0] * 7) + b"hi") == "hi"
        # UTF-8 multibyte: length counts bytes, not code points
        enc = hm.Str.encode("é")
        assert enc[:8] == bytes([2] + [0] * 7) and len(enc) == 10

    def test_option(self):
        d = hm.option_of(hm.U32)
        assert d.encode(None) == b"\x00"
        assert d.encode(5) == bytes([1, 5, 0, 0, 0])
        assert d.decode(b"\x00") is None
        assert d.decode(bytes([1, 5, 0, 0, 0])) == 5

    def test_enum_c_like(self):
        d = hm.enum_of("Red", "Green", "Blue", name="Color")
        assert d.is_fixed_size and d.num_bytes == 4
        assert d.encode("Green") == bytes([1, 0, 0, 0])
        assert d.decode(bytes([2, 0, 0, 0])) == "Blue"

    def test_enum_with_payload(self):
        d = codec.EnumDescriptor(
            [("None_", None), ("Byte", hm.U8), ("Word", hm.U32)], name="Tag"
        )
        assert not d.is_fixed_size
        assert d.encode("None_") == bytes(4)
        assert d.encode(("Byte", 7)) == bytes([1, 0, 0, 0, 7])
        assert d.decode(bytes([2, 0, 0, 0, 1, 2, 0, 0])) == ("Word", 513)

    def test_nested_vec(self):
        d = hm.vec_of(hm.vec_of(hm.U8))
        v = [[1], [2, 3]]
        assert d.decode(d.encode(v)) == v

    def test_struct_with_varlen_field(self):
        d = codec.StructDescriptor(
            [("id", hm.U16), ("name", hm.Str)], name="Named"
        )
        assert not d.is_fixed_size
        got = d.decode(d.encode({"id": 7, "name": "ok"}))
        assert got == {"id": 7, "name": "ok"}


class TestDecodeGuards:
    """The decode-bomb cap (src/cipher.rs:15) is load-bearing."""

    def test_length_prefix_beyond_buffer(self):
        d = hm.vec_of(hm.U8)
        with pytest.raises(hm.DeserializeError, match="claims"):
            d.decode(bytes([100] + [0] * 7 + [1, 2, 3]))

    def test_length_prefix_beyond_cap(self):
        d = hm.vec_of(hm.U8)
        huge = (hm.MAX_DECODE_BYTES + 1).to_bytes(8, "little")
        with pytest.raises(hm.DecodeTooLargeError):
            d.decode(huge + bytes(4))

    def test_string_cap(self):
        huge = (1 << 40).to_bytes(8, "little")
        with pytest.raises(hm.DecodeTooLargeError):
            hm.Str.decode(huge)

    def test_truncated_prefix(self):
        with pytest.raises(hm.DeserializeError, match="truncated"):
            hm.Str.decode(bytes(4))

    def test_invalid_option_tag(self):
        with pytest.raises(hm.DeserializeError, match="tag"):
            hm.option_of(hm.U8).decode(b"\x02\x00")

    def test_enum_discriminant_out_of_range(self):
        d = hm.enum_of("A", "B")
        with pytest.raises(hm.DeserializeError, match="out of range"):
            d.decode(bytes([9, 0, 0, 0]))

    def test_trailing_bytes_rejected(self):
        d = hm.vec_of(hm.U8)
        with pytest.raises(hm.DeserializeError, match="trailing"):
            d.decode(bytes([1] + [0] * 7 + [5, 99]))

    def test_invalid_utf8(self):
        with pytest.raises(hm.DeserializeError, match="UTF-8"):
            hm.Str.decode(bytes([1] + [0] * 7 + [0xFF]))

    def test_num_bits_undefined_for_varlen(self):
        with pytest.raises(TypeError, match="variable-length"):
            _ = hm.vec_of(hm.U8).num_bits


class TestCipheredVarlen:
    """End-to-end encrypt -> decrypt of variable-length plaintexts."""

    def test_vec_u8_roundtrip(self):
        ctx = make_ctx(1)
        c = ctx.encrypt([10, 20, 255], hm.vec_of(hm.U8))
        assert len(c) == (8 + 3) * 8  # u64 prefix + 3 elements
        assert ctx.decrypt(c) == [10, 20, 255]

    def test_string_roundtrip(self):
        ctx = make_ctx(2)
        c = ctx.encrypt("homomorph", hm.Str)
        assert ctx.decrypt(c) == "homomorph"

    def test_string_descriptor_inferred(self):
        ctx = make_ctx(3)
        c = ctx.encrypt("abc")  # descriptor_for infers Str
        assert ctx.decrypt(c) == "abc"

    def test_option_roundtrip(self):
        ctx = make_ctx(4)
        d = hm.option_of(hm.U16)
        assert ctx.decrypt(ctx.encrypt(1234, d)) == 1234
        assert ctx.decrypt(ctx.encrypt(None, d)) is None

    def test_enum_roundtrip_batched(self):
        ctx = make_ctx(5)
        d = hm.enum_of("Red", "Green", "Blue", name="Color")
        c = ctx.encrypt(["Blue", "Red"], d, batch=True)
        assert list(ctx.decrypt(c)) == ["Blue", "Red"]

    def test_batch_varlen_equal_lengths_ok(self):
        ctx = make_ctx(6)
        d = hm.vec_of(hm.U8)
        c = ctx.encrypt([[1, 2], [3, 4]], d, batch=True)
        assert [list(v) for v in ctx.decrypt(c)] == [[1, 2], [3, 4]]

    def test_batch_varlen_unequal_lengths_rejected(self):
        ctx = make_ctx(7)
        with pytest.raises(hm.SerializeError, match="equal byte lengths"):
            ctx.encrypt([[1], [2, 3]], hm.vec_of(hm.U8), batch=True)

    def test_trivial_varlen(self):
        ctx = make_ctx(8)
        c = Ciphered.trivial("xyz", hm.Str)
        assert ctx.decrypt(c) == "xyz"

    def test_decipher_bomb_raises(self):
        """A ciphertext whose plaintext claims a huge allocation must fail
        at decode, not allocate (the trivial path makes this cheap)."""
        ctx = make_ctx(9)
        huge = (1 << 40).to_bytes(8, "little")
        bomb = Ciphered.trivial(huge, codec.BytesDescriptor(8))
        as_vec = bomb.reinterpret(hm.vec_of(hm.U8))
        with pytest.raises(hm.DecodeTooLargeError):
            ctx.decrypt(as_vec)


class TestDecoderFuzz:
    """Arbitrary bytes through the varlen decoders must either decode or
    raise the TYPED errors (DeserializeError / DecodeTooLargeError) -
    never crash with anything else, never hang, never allocate per an
    attacker-controlled length prefix (the decode-bomb contract)."""

    DESCRIPTORS = None  # built lazily to use hm at runtime

    @classmethod
    def _descriptors(cls):
        if cls.DESCRIPTORS is None:
            cls.DESCRIPTORS = [
                hm.vec_of(hm.U8),
                hm.vec_of(hm.U32),
                hm.vec_of(hm.vec_of(hm.U8)),
                hm.Str,
                hm.option_of(hm.U16),
                hm.option_of(hm.Str),
                hm.enum_of("A", "B", "C"),
                codec.EnumDescriptor([("X", None), ("Y", hm.vec_of(hm.U8))]),
                codec.StructDescriptor([("a", hm.U8), ("b", hm.Str)]),
                codec.ArrayDescriptor(hm.option_of(hm.U8), 3),
            ]
        return cls.DESCRIPTORS

    def test_random_bytes_never_crash(self):
        rng = np.random.default_rng(0xFADE)
        for desc in self._descriptors():
            for _ in range(200):
                n = int(rng.integers(0, 40))
                data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
                try:
                    desc.decode(data)
                except (hm.DeserializeError, hm.DecodeTooLargeError):
                    pass

    def test_adversarial_length_prefixes(self):
        for desc in (hm.vec_of(hm.U8), hm.Str, hm.vec_of(hm.vec_of(hm.U8))):
            for n in (2**63, 2**64 - 1, hm.MAX_DECODE_BYTES + 1, 2**32):
                data = int(n).to_bytes(8, "little") + b"\x00" * 16
                with pytest.raises((hm.DeserializeError, hm.DecodeTooLargeError)):
                    desc.decode(data)

    def test_roundtrip_fuzz(self):
        """encode -> decode is the identity for random well-formed values."""
        rng = np.random.default_rng(0xBEEF)
        vec8 = hm.vec_of(hm.U8)
        opt = hm.option_of(hm.U16)
        for _ in range(100):
            v = [int(x) for x in rng.integers(0, 256, size=rng.integers(0, 9))]
            assert vec8.decode(vec8.encode(v)) == v
            o = None if rng.random() < 0.3 else int(rng.integers(0, 65536))
            assert opt.decode(opt.encode(o)) == o
            s = "".join(chr(c) for c in rng.integers(32, 0x300, size=6))
            assert hm.Str.decode(hm.Str.encode(s)) == s
