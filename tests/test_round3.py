"""Round-3 hardening tests: signed comparisons, key-loading validation,
versioned ciphertext wire format, slim Ciphered[Bool] layout, recursive
descriptor inference.

Reference anchors: two's-complement comparison semantics follow
src/impls/numbers/int.rs; division-by-null-key panics follow
src/polynomial.rs:318-322; degree-trimmed storage follows
src/polynomial.rs:404-426.
"""

import dataclasses
from typing import Optional

import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu import codec
from homomorph_tpu.models import (
    HomomorphicGreaterThan,
    HomomorphicLessThan,
    circuits,
)
from homomorph_tpu.utils.errors import DeserializeError


def make_ctx(d, dp, delta, tau, seed=0):
    ctx = hm.Context(hm.Parameters(d, dp, delta, tau), source=hm.ThreefrySource(seed))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    return ctx


@pytest.fixture(scope="module")
def ctx():
    return make_ctx(128, 16, 1, 16, seed=11)


# --------------------------------------------------------------------------
# Signed comparisons (VERDICT r2 item 4)
# --------------------------------------------------------------------------


class TestSignedComparisons:
    CASES_I8 = [(-3, 2), (2, -3), (-3, -5), (-5, -3), (7, 7), (-7, -7),
                (-128, 127), (127, -128), (0, -1), (-1, 0)]

    def test_lt_i8(self, ctx):
        xs, ys = zip(*self.CASES_I8)
        a = ctx.encrypt(list(xs), hm.I8, batch=True)
        b = ctx.encrypt(list(ys), hm.I8, batch=True)
        got = [bool(v) for v in ctx.decrypt(ctx.apply2(HomomorphicLessThan, a, b))]
        assert got == [x < y for x, y in self.CASES_I8]

    def test_gt_i8(self, ctx):
        xs, ys = zip(*self.CASES_I8)
        a = ctx.encrypt(list(xs), hm.I8, batch=True)
        b = ctx.encrypt(list(ys), hm.I8, batch=True)
        got = [bool(v) for v in ctx.decrypt(ctx.apply2(HomomorphicGreaterThan, a, b))]
        assert got == [x > y for x, y in self.CASES_I8]

    def test_le_ge_i8(self, ctx):
        cases = [(-3, 2), (2, -3), (4, 4), (-4, -4)]
        xs, ys = zip(*cases)
        a = ctx.encrypt(list(xs), hm.I8, batch=True)
        b = ctx.encrypt(list(ys), hm.I8, batch=True)
        le = [bool(v) for v in ctx.decrypt(circuits.le(a, b))]
        ge = [bool(v) for v in ctx.decrypt(circuits.ge(a, b))]
        assert le == [x <= y for x, y in cases]
        assert ge == [x >= y for x, y in cases]

    def test_unsigned_unchanged(self, ctx):
        cases = [(3, 200), (200, 3), (128, 127), (5, 5)]
        xs, ys = zip(*cases)
        a = ctx.encrypt(list(xs), hm.U8, batch=True)
        b = ctx.encrypt(list(ys), hm.U8, batch=True)
        got = [bool(v) for v in ctx.decrypt(ctx.apply2(HomomorphicLessThan, a, b))]
        assert got == [x < y for x, y in cases]

    def test_lt_i16(self):
        # i16 needs d/delta >= compare requirement for 16 lanes (97)
        ctx = make_ctx(128, 16, 1, 16, seed=5)
        cases = [(-30000, 2), (2, -30000), (-1, -2), (1000, -1000)]
        xs, ys = zip(*cases)
        a = ctx.encrypt(list(xs), hm.I16, batch=True)
        b = ctx.encrypt(list(ys), hm.I16, batch=True)
        got = [bool(v) for v in ctx.decrypt(ctx.apply2(HomomorphicLessThan, a, b))]
        assert got == [x < y for x, y in cases]

    @pytest.mark.slow
    def test_lt_i32(self):
        ctx = make_ctx(256, 16, 1, 16, seed=6)
        cases = [(-(2**31), 2**31 - 1), (-5, -6), (12345, -12345)]
        xs, ys = zip(*cases)
        a = ctx.encrypt(list(xs), hm.I32, batch=True)
        b = ctx.encrypt(list(ys), hm.I32, batch=True)
        got = [bool(v) for v in ctx.decrypt(ctx.apply2(HomomorphicLessThan, a, b))]
        assert got == [x < y for x, y in cases]

    def test_requirement_unchanged_by_signedness(self):
        # Sign-bit flip is an XOR with one() - degree-free, so the checked
        # API's bound for i8 equals the u8 bound.
        class Lanes:
            noise = 2  # fresh (cipher.FRESH_NOISE)

            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

        assert HomomorphicLessThan.requirement_for(
            Lanes(8), Lanes(8)
        ) == HomomorphicGreaterThan.requirement_for(Lanes(8), Lanes(8))


# --------------------------------------------------------------------------
# Key-loading hardening (VERDICT r2 item 5)
# --------------------------------------------------------------------------


class TestKeyHardening:
    def test_null_secret_key_rejected(self):
        with pytest.raises(ValueError, match="degenerate"):
            hm.SecretKey.from_bytes(b"\x00" * 8)

    def test_constant_secret_key_rejected(self):
        # S = 1 (degree 0): rem by it returns 0 for everything
        with pytest.raises(ValueError, match="degenerate"):
            hm.SecretKey(np.array([1], dtype=np.uint32))

    def test_degree_one_key_accepted(self):
        sk = hm.SecretKey(np.array([2], dtype=np.uint32))  # S = X
        assert sk.degree == 1

    def test_empty_public_key_rejected(self):
        with pytest.raises(ValueError, match="at least one"):
            hm.PublicKey.from_bytes([])

    def test_empty_public_key_row_rejected(self):
        with pytest.raises(ValueError, match="row 1 is empty"):
            hm.PublicKey.from_bytes([b"\x05\x00\x00\x00", b""])

    def test_null_public_key_row_rejected(self):
        with pytest.raises(ValueError, match="null polynomial"):
            hm.PublicKey.from_bytes([b"\x05\x00\x00\x00", b"\x00" * 8])

    def test_valid_keys_roundtrip(self, ctx):
        sk = hm.SecretKey.from_bytes(ctx.get_secret_key().to_bytes())
        pk = hm.PublicKey.from_bytes(ctx.get_public_key().to_bytes())
        assert sk == ctx.get_secret_key()
        assert pk == ctx.get_public_key()


# --------------------------------------------------------------------------
# Versioned ciphertext wire format (VERDICT r2 item 6)
# --------------------------------------------------------------------------


class TestWireFormat:
    def test_roundtrip(self, ctx):
        c = ctx.encrypt(173, hm.U8)
        c2 = hm.Ciphered.from_bytes(c.to_bytes(), hm.U8)
        assert int(ctx.decrypt(c2)) == 173

    def test_magic_rejected(self, ctx):
        buf = bytearray(ctx.encrypt(1, hm.U8).to_bytes())
        buf[0] ^= 0xFF
        with pytest.raises(DeserializeError, match="magic"):
            hm.Ciphered.from_bytes(bytes(buf), hm.U8)

    def test_unknown_version_rejected(self, ctx):
        buf = bytearray(ctx.encrypt(1, hm.U8).to_bytes())
        buf[4:8] = (99).to_bytes(4, "little")
        with pytest.raises(DeserializeError, match="version 99"):
            hm.Ciphered.from_bytes(bytes(buf), hm.U8)

    def test_legacy_unversioned_buffer_rejected(self, ctx):
        # The round-2 format began with a bare n_bits u32; such a buffer
        # can never start with the magic, so it is detected, not misparsed.
        c = ctx.encrypt(7, hm.U8)
        legacy = np.array([8, c.num_limbs, c.bound, 0], dtype="<u4").tobytes()
        legacy += np.asarray(c.limbs, dtype="<u4").tobytes()
        with pytest.raises(DeserializeError, match="magic"):
            hm.Ciphered.from_bytes(legacy, hm.U8)

    def test_truncated_rejected(self, ctx):
        buf = ctx.encrypt(1, hm.U8).to_bytes()
        with pytest.raises(DeserializeError):
            hm.Ciphered.from_bytes(buf[:-4], hm.U8)


# --------------------------------------------------------------------------
# Slim Ciphered[Bool] layout (VERDICT r2 item 9)
# --------------------------------------------------------------------------


class TestSlimBool:
    def test_compare_result_stores_one_lane(self, ctx):
        a = ctx.encrypt(30, hm.U8)
        b = ctx.encrypt(50, hm.U8)
        r = circuits.lt(a, b)
        assert len(r) == 8  # logical: a bincode bool byte
        assert r.limbs.shape[-2] == 1  # physical: lane 0 only (1/8 the bytes)
        assert r.zero_lanes == 7
        assert bool(ctx.decrypt(r)) is True

    def test_eq_result_slim_and_correct(self, ctx):
        a = ctx.encrypt([9, 9], hm.U8, batch=True)
        b = ctx.encrypt([9, 10], hm.U8, batch=True)
        r = circuits.eq(a, b)
        assert r.limbs.shape[-2] == 1 and r.zero_lanes == 7
        assert [bool(v) for v in ctx.decrypt(r)] == [True, False]

    def test_slim_bool_serializes(self, ctx):
        r = circuits.lt(ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8))
        r2 = hm.Ciphered.from_bytes(r.to_bytes(), hm.Bool)
        assert r2.zero_lanes == 7 and len(r2) == 8
        assert bool(ctx.decrypt(r2)) is True

    def test_gate_not_densifies(self, ctx):
        # NOT of an implicit zero lane is a trivial one - the densify seam
        # must materialize lanes before lane-tensor math.
        r = circuits.lt(ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8))
        n = circuits.gate_not(r)
        assert n.limbs.shape[-2] == 8
        bits = n.decipher_bits(ctx.get_secret_key())
        assert list(bits) == [0, 1, 1, 1, 1, 1, 1, 1]  # ~True byte = 0xFE

    def test_implicit_lane_access(self, ctx):
        r = circuits.lt(ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8))
        lane7 = r[7]
        assert int(lane7.decipher(ctx.get_secret_key())) == 0
        with pytest.raises(IndexError):
            r[8]

    def test_xor_of_two_slim_bools(self, ctx):
        t = circuits.lt(ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8))
        f = circuits.lt(ctx.encrypt(2, hm.U8), ctx.encrypt(1, hm.U8))
        assert bool(ctx.decrypt(circuits.gate_xor(t, f))) is True
        assert bool(ctx.decrypt(circuits.gate_xor(t, t))) is False


# --------------------------------------------------------------------------
# Recursive descriptor inference (VERDICT r2 item 10)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class Inner:
    a: np.uint8
    b: np.uint16


@dataclasses.dataclass
class Outer:
    flag: bool
    inner: Inner
    weight: float


@dataclasses.dataclass
class WithVarlen:
    name: str
    tags: list[np.uint8]
    extra: Optional[np.uint32]


@dataclasses.dataclass
class BadInt:
    n: int


class TestRecursiveStructOf:
    def test_nested_dataclass(self):
        d = hm.struct_of(Outer)
        assert d.num_bytes == 1 + 3 + 8
        v = Outer(flag=True, inner=Inner(a=7, b=300), weight=2.5)
        out, _ = d.decode_from(d.encode(v), 0)
        assert out.flag is True and out.inner.a == 7 and out.inner.b == 300
        assert out.weight == 2.5

    def test_varlen_annotations(self):
        d = hm.struct_of(WithVarlen)
        assert d.num_bytes is None  # varlen fields -> value-sized
        v = WithVarlen(name="hi", tags=[1, 2, 3], extra=9)
        out, _ = d.decode_from(d.encode(v), 0)
        assert out.name == "hi" and out.tags == [1, 2, 3] and out.extra == 9
        v2 = WithVarlen(name="", tags=[], extra=None)
        out2, _ = d.decode_from(d.encode(v2), 0)
        assert out2.name == "" and out2.tags == [] and out2.extra is None

    def test_plain_int_rejected_with_guidance(self):
        with pytest.raises(TypeError, match="no fixed wire width"):
            hm.struct_of(BadInt)

    def test_override_still_wins(self):
        d = hm.struct_of(BadInt, n=codec.U32)
        assert d.num_bytes == 4

    def test_nested_encrypt_roundtrip(self, ctx):
        d = hm.struct_of(Outer)
        v = Outer(flag=False, inner=Inner(a=200, b=65535), weight=-1.25)
        c = ctx.encrypt(v, d)
        out = ctx.decrypt(c)
        assert out.flag is False and out.inner.a == 200
        assert out.inner.b == 65535 and out.weight == -1.25


# --------------------------------------------------------------------------
# Round-3 op-library extensions: shifts, rotates, min/max
# --------------------------------------------------------------------------


class TestShiftsRotates:
    def test_shl(self, ctx):
        vals = [1, 0x81, 255]
        a = ctx.encrypt(vals, hm.U8, batch=True)
        for k in (0, 1, 3, 7, 8, 12):
            got = [int(v) for v in ctx.decrypt(circuits.shl(a, k))]
            assert got == [(v << k) & 0xFF for v in vals], k

    def test_shr_logical(self, ctx):
        vals = [0x80, 0xFF, 3]
        a = ctx.encrypt(vals, hm.U8, batch=True)
        for k in (0, 1, 4, 7, 8, 11):
            got = [int(v) for v in ctx.decrypt(circuits.shr(a, k))]
            assert got == [v >> k for v in vals], k

    def test_shr_arithmetic_for_signed(self, ctx):
        vals = [-128, -1, 64, -37]
        a = ctx.encrypt(vals, hm.I8, batch=True)
        for k in (1, 3, 7):
            got = [int(v) for v in ctx.decrypt(circuits.shr(a, k))]
            assert got == [v >> k for v in vals], k  # python >> is arithmetic

    def test_rotl_rotr(self, ctx):
        vals = [0b10010110, 1]
        a = ctx.encrypt(vals, hm.U8, batch=True)
        for k in (0, 1, 5, 8, 13):
            got = [int(v) for v in ctx.decrypt(circuits.rotl(a, k))]
            want = [((v << (k % 8)) | (v >> (8 - k % 8))) & 0xFF if k % 8 else v
                    for v in vals]
            assert got == want, k
        got = [int(v) for v in ctx.decrypt(circuits.rotr(a, 3))]
        assert got == [((v >> 3) | (v << 5)) & 0xFF for v in vals]

    def test_shift_is_degree_free(self, ctx):
        a = ctx.encrypt(200, hm.U8)
        assert circuits.shl(a, 3).bound == a.bound
        assert circuits.rotl(a, 3).bound == a.bound

    def test_negative_shift_rejected(self, ctx):
        a = ctx.encrypt(1, hm.U8)
        with pytest.raises(ValueError):
            circuits.shl(a, -1)


class TestMinMax:
    def test_unsigned(self, ctx):
        from homomorph_tpu.models import HomomorphicMaximum, HomomorphicMinimum

        cases = [(30, 200), (200, 30), (7, 7)]
        xs, ys = zip(*cases)
        a = ctx.encrypt(list(xs), hm.U8, batch=True)
        b = ctx.encrypt(list(ys), hm.U8, batch=True)
        mn = [int(v) for v in ctx.decrypt(ctx.apply2(HomomorphicMinimum, a, b))]
        mx = [int(v) for v in ctx.decrypt(ctx.apply2(HomomorphicMaximum, a, b))]
        assert mn == [min(x, y) for x, y in cases]
        assert mx == [max(x, y) for x, y in cases]

    def test_signed(self, ctx):
        from homomorph_tpu.models import HomomorphicMinimum

        cases = [(-3, 2), (2, -3), (-100, -99)]
        xs, ys = zip(*cases)
        a = ctx.encrypt(list(xs), hm.I8, batch=True)
        b = ctx.encrypt(list(ys), hm.I8, batch=True)
        mn = [int(v) for v in ctx.decrypt(ctx.apply2(HomomorphicMinimum, a, b))]
        assert mn == [min(x, y) for x, y in cases]

    def test_requirement_rejects_tight_params(self):
        from homomorph_tpu.models import HomomorphicMinimum

        # u8 min with the tree comparator needs d/delta >= 21 (noise.py);
        # delta=4 makes 21*4 = 84 > 64 -> rejected, while delta=2 (42 <= 64)
        # is now VALID (the borrow-chain comparator needed 51).
        ctx = make_ctx(64, 16, 4, 16)
        a, b = ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8)
        with pytest.raises(hm.InvalidParametersError):
            ctx.apply2(HomomorphicMinimum, a, b)
        ctx2 = make_ctx(64, 16, 2, 16, seed=3)
        a2, b2 = ctx2.encrypt(9, hm.U8), ctx2.encrypt(4, hm.U8)
        assert int(ctx2.decrypt(ctx2.apply2(HomomorphicMinimum, a2, b2))) == 4


class TestReviewFixes:
    """Round-3 self-review findings (see git history)."""

    def test_negative_out_of_range_lane_raises(self, ctx):
        c = ctx.encrypt(5, hm.U8)
        assert int(c[-1].decipher(ctx.get_secret_key())) == 0  # top bit of 5
        with pytest.raises(IndexError):
            c[-9]
        r = circuits.lt(ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8))
        assert int(r[-1].decipher(ctx.get_secret_key())) == 0  # implicit zero
        with pytest.raises(IndexError):
            r[-9]

    def test_bare_list_annotation_guided_error(self):
        @dataclasses.dataclass
        class BadList:
            xs: list

        with pytest.raises(TypeError, match="list\\[T\\]"):
            hm.struct_of(BadList)


class TestTreeComparator:
    """The tree comparator must agree with the independent borrow-chain
    oracle (NOT carry_out(a + ~b + 1)) on every value pair polarity, and
    its exact noise bound must be ~3x tighter."""

    def test_tree_matches_borrow_oracle(self, ctx):
        from homomorph_tpu.cipher import CipheredBit
        from homomorph_tpu.models.circuits import _adder_carry_out, gate_not

        rng = np.random.default_rng(33)
        xs = [int(v) for v in rng.integers(0, 256, size=16)] + [0, 255, 7, 7]
        ys = [int(v) for v in rng.integers(0, 256, size=16)] + [255, 0, 7, 8]
        a = ctx.encrypt(xs, hm.U8, batch=True)
        b = ctx.encrypt(ys, hm.U8, batch=True)
        tree = [bool(v) for v in ctx.decrypt(circuits.lt(a, b))]
        carry = _adder_carry_out(a, gate_not(b), CipheredBit.one(a.batch_shape))
        borrow = [
            bool(v) for v in np.asarray(carry.not_().decipher(ctx.get_secret_key()))
        ]
        want = [x < y for x, y in zip(xs, ys)]
        assert tree == want
        assert borrow == want

    def test_bound_is_tighter(self):
        from homomorph_tpu.models import noise

        assert noise.compare_noise_degree(8, 1) == 18  # (n+1)*(delta+1)
        assert noise.compare_noise_degree(32, 1) == 66
        # non-power-of-two width: simulated exactly, still ~linear
        assert noise.compare_noise_degree(5, 1) <= 14

    def test_u8_compare_at_small_d(self):
        # requirement 19 -> d=32, delta=1 suffices now (borrow chain needed 49)
        ctx = make_ctx(32, 8, 1, 8, seed=41)
        a = ctx.encrypt([3, 200], hm.U8, batch=True)
        b = ctx.encrypt([5, 100], hm.U8, batch=True)
        got = [bool(v) for v in ctx.decrypt(ctx.apply2(HomomorphicLessThan, a, b))]
        assert got == [True, False]


class TestAbsClamp:
    def test_abs(self, ctx):
        vals = [0, 5, -5, 127, -127, -128]
        a = ctx.encrypt(vals, hm.I8, batch=True)
        got = [int(v) for v in ctx.decrypt(circuits.abs_(a))]
        # wrapping at the type minimum, like Rust's wrapping_abs
        assert got == [0, 5, 5, 127, 127, -128]

    def test_clamp(self, ctx):
        vals = [1, 50, 120]
        a = ctx.encrypt(vals, hm.U8, batch=True)
        lo = ctx.encrypt([10] * 3, hm.U8, batch=True)
        hi = ctx.encrypt([100] * 3, hm.U8, batch=True)
        got = [int(v) for v in ctx.decrypt(circuits.clamp(a, lo, hi))]
        assert got == [10, 50, 100]


class TestTreeOddWidth:
    def test_odd_lane_count_matches_oracle(self, ctx):
        # 5-lane raw values: the tree's odd-width passthrough path
        from homomorph_tpu.cipher import CipheredBit
        from homomorph_tpu.models.circuits import _adder_carry_out, _lt_tree, gate_not

        rng = np.random.default_rng(55)
        xs = [int(v) for v in rng.integers(0, 32, size=12)] + [31, 0, 17, 17]
        ys = [int(v) for v in rng.integers(0, 32, size=12)] + [0, 31, 17, 18]
        a8 = ctx.encrypt(xs, hm.U8, batch=True)
        b8 = ctx.encrypt(ys, hm.U8, batch=True)
        a = hm.Ciphered(a8.limbs[..., :5, :], a8.bound, hm.BytesDescriptor(1))
        b = hm.Ciphered(b8.limbs[..., :5, :], b8.bound, hm.BytesDescriptor(1))
        sk = ctx.get_secret_key()
        tree = [int(v) for v in np.asarray(_lt_tree(a, b).decipher(sk))]
        carry = _adder_carry_out(a, gate_not(b), CipheredBit.one(a.batch_shape))
        borrow = [int(v) for v in np.asarray(carry.not_().decipher(sk))]
        want = [int(x < y) for x, y in zip(xs, ys)]
        assert tree == want and borrow == want
