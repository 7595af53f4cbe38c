"""Gate / adder / multiplier tests (reference: src/impls/numbers/{uint,int}.rs)."""

import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu.models import (
    HomomorphicAddition,
    HomomorphicAndGate,
    HomomorphicMultiplication,
    HomomorphicNotGate,
    HomomorphicOrGate,
    HomomorphicXorGate,
)


def make_ctx(d, dp, delta, tau, seed=0):
    ctx = hm.Context(hm.Parameters(d, dp, delta, tau), source=hm.ThreefrySource(seed))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    return ctx


class TestGates:
    # uint.rs:108-174 truth tables at (32,8,8,8) / (32,16,16,16); the
    # AND/OR contexts use d=40 because the checked API now validates the
    # exact fresh bound d >= 5*delta (the reference's published 2 is
    # unsound - models/numbers.py, NOISE.md §4)
    def test_and(self):
        ctx = make_ctx(40, 8, 8, 8)
        a, b = ctx.encrypt(0b1010, hm.U8), ctx.encrypt(0b1100, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicAndGate, a, b)) == 0b1000

    def test_or(self):
        ctx = make_ctx(40, 8, 8, 8)
        a, b = ctx.encrypt(0b1010, hm.U8), ctx.encrypt(0b1100, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicOrGate, a, b)) == 0b1110

    def test_xor(self):
        ctx = make_ctx(32, 16, 16, 16)
        a, b = ctx.encrypt(0b1010, hm.U8), ctx.encrypt(0b1100, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicXorGate, a, b)) == 0b0110

    def test_not(self):
        ctx = make_ctx(32, 16, 16, 16)
        a = ctx.encrypt(0b00001010, hm.U8)
        assert ctx.decrypt(ctx.apply1(HomomorphicNotGate, a)) == 0b11110101
        a = ctx.encrypt(0b00001100, hm.U8)
        assert ctx.decrypt(ctx.apply1(HomomorphicNotGate, a)) == 0b11110011

    def test_signed_gates(self):
        # int.rs gate tests (d=40: checked AND needs d >= 5*delta)
        ctx = make_ctx(40, 8, 8, 8)
        a, b = ctx.encrypt(0b1010, hm.I8), ctx.encrypt(0b1100, hm.I8)
        assert ctx.decrypt(ctx.apply2(HomomorphicAndGate, a, b)) == 0b1000


class TestAddition:
    # uint.rs:176-208 at (64,16,1,16)
    def test_simple(self):
        ctx = make_ctx(64, 16, 1, 16)
        a, b = ctx.encrypt(22, hm.U8), ctx.encrypt(20, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b)) == 42

    def test_random_u16(self, rng):
        # u16 add exact bound: d/delta >= 89 (models/noise.py)
        ctx = make_ctx(128, 16, 1, 16, seed=1)
        x, y = int(rng.integers(0, 2**15)), int(rng.integers(0, 2**15))
        a, b = ctx.encrypt(x, hm.U16), ctx.encrypt(y, hm.U16)
        assert ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b)) == x + y

    def test_wrapping(self):
        ctx = make_ctx(64, 16, 1, 16, seed=2)
        a, b = ctx.encrypt(255, hm.U8), ctx.encrypt(240, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b)) == 239

    def test_signed(self):
        # int.rs signed addition (two's complement)
        ctx = make_ctx(64, 16, 1, 16, seed=3)
        a, b = ctx.encrypt(-22, hm.I8), ctx.encrypt(20, hm.I8)
        assert ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b)) == -2

    def test_requires_d_over_delta(self):
        ctx = make_ctx(64, 32, 8, 32)  # d/delta = 8 < 21
        a, b = ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8)
        with pytest.raises(hm.InvalidParametersError):
            ctx.apply2(HomomorphicAddition, a, b)

    def test_batched(self, rng):
        ctx = make_ctx(64, 16, 1, 16, seed=4)
        xs = [int(v) for v in rng.integers(0, 128, size=8)]
        ys = [int(v) for v in rng.integers(0, 127, size=8)]
        a = ctx.encrypt(xs, hm.U8, batch=True)
        b = ctx.encrypt(ys, hm.U8, batch=True)
        out = ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b))
        assert list(out) == [(x + y) % 256 for x, y in zip(xs, ys)]


class TestSuccessiveAddition:
    # uint.rs:230-252 (scaled down from the ignored long test).  The
    # reference chains through its UNSAFE apply; our checked API tracks
    # composed noise (round 4) and must REJECT the first out-of-envelope
    # fold, while the unchecked circuit still computes it (statistically
    # correct, like the reference's own test).  Round 5: the majority
    # carry recurrence cut the chained u8 noise 40/534/6,956 ->
    # 16/114/800 per fold, so TWO folds now fit d=256 (the reference's
    # config) and the rejection moves to the third.
    def test_four_way(self):
        from homomorph_tpu.models import circuits

        # d=256 as in the reference's successive-addition test (uint.rs:233)
        ctx = make_ctx(256, 32, 1, 32, seed=5)  # seed 5: S(0)=0 (verified)
        assert int(np.asarray(ctx.get_secret_key().limbs)[0] & 1) == 0
        xs = (11, 22, 30, 40)
        ca, cb, cc, cd = (ctx.encrypt(x, hm.U8) for x in xs)
        d = ctx.apply2(HomomorphicAddition, ca, cb)  # in-envelope (16 < 256)
        assert d.noise == 16
        e = ctx.apply2(HomomorphicAddition, d, cc)  # in-envelope (114 < 256)
        assert e.noise == 114
        with pytest.raises(hm.InvalidParametersError):
            ctx.apply2(HomomorphicAddition, e, cd)  # composed: 800 > 256
        f = circuits.add(e, cd)  # the reference's unsafe-apply semantics
        assert f.noise == 800
        # beyond-envelope decrypt is sound on this pinned S(0)=0 key
        assert ctx.decrypt(f) == sum(xs) & 0xFF


class TestMultiplication:
    # uint.rs:254-293 semantics.  d = 160: the EXACT u8-mul noise bound is
    # 64*delta for the carry-save tree with the round-5 majority ripple
    # (models/noise.py), so the checked API requires d/delta >= 65 - the
    # reference's (128,*,1,*) configs are now PROVABLY SOUND under this
    # circuit (under the reference's own circuit, bound 152, they decrypt
    # only on S(0)=0 keys; NOISE.md).
    @pytest.fixture(scope="class")
    def ctx(self):
        return make_ctx(160, 16, 1, 16, seed=6)

    def test_simple(self, ctx):
        a, b = ctx.encrypt(6, hm.U8), ctx.encrypt(7, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == 42

    def test_by_zero(self, ctx):
        a, b = ctx.encrypt(0, hm.U8), ctx.encrypt(151, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == 0

    def test_random(self, ctx, rng):
        x, y = int(rng.integers(0, 13)), int(rng.integers(0, 20))
        a, b = ctx.encrypt(x, hm.U8), ctx.encrypt(y, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == x * y

    def test_wrapping(self, ctx):
        a, b = ctx.encrypt(255, hm.U8), ctx.encrypt(240, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == 16

    # int.rs:247-268 signed cases
    def test_signed(self, ctx):
        a, b = ctx.encrypt(-6, hm.I8), ctx.encrypt(7, hm.I8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == -42

    def test_signed_both_negative(self, ctx):
        a, b = ctx.encrypt(-6, hm.I8), ctx.encrypt(-7, hm.I8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == 42

    def test_requires_d_over_delta(self):
        ctx = make_ctx(64, 16, 1, 16)  # d/delta = 64... use delta=2 -> 32 < 64
        ctx = make_ctx(64, 16, 2, 16)
        a, b = ctx.encrypt(1, hm.U8), ctx.encrypt(2, hm.U8)
        with pytest.raises(hm.InvalidParametersError):
            ctx.apply2(HomomorphicMultiplication, a, b)


@pytest.mark.slow
class TestExtensive:
    # analogues of the #[ignore = "long test"] cases (uint.rs:210-252) at
    # production-ish params (256,128,1,128)
    def test_addition_extensive(self, rng):
        ctx = make_ctx(256, 128, 1, 128, seed=7)
        x = int(rng.integers(0, 2**31))
        y = int(rng.integers(0, 2**31))
        a, b = ctx.encrypt(x, hm.U32), ctx.encrypt(y, hm.U32)
        assert ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b)) == x + y

    def test_addition_extensive_many_operands(self, rng):
        """uint.rs:210-228 at its exact params with MANY random operands
        (the reference's ignored long test repeats single pairs; here one
        batched apply carries 16 independent random pairs)."""
        ctx = make_ctx(256, 128, 1, 128, seed=7)
        xs = [int(v) for v in rng.integers(0, 2**32, size=16, dtype=np.uint64)]
        ys = [int(v) for v in rng.integers(0, 2**32, size=16, dtype=np.uint64)]
        a = ctx.encrypt(xs, hm.U32, batch=True)
        b = ctx.encrypt(ys, hm.U32, batch=True)
        out = ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b))
        assert list(out) == [(x + y) & 0xFFFFFFFF for x, y in zip(xs, ys)]

    def test_successive_addition_soak(self, rng):
        """uint.rs:230-252 (successive addition) at its exact params
        (256,128,1,128), folded over many random u8 operands with a
        decrypt-and-assert after EVERY step - the degree-class soak the
        round-3 verdict asked for (ciphertext limbs grow 13 -> 96 ->
        768 -> ~4800 across folds, crossing every bucketing boundary;
        the round-5 majority carry recurrence shrank fold-3's degree
        bound 1.33M -> 153,600 bits, ~9x less growth per fold).

        The first fold is within the exact every-key envelope; later
        folds exceed it (chained u8 noise degree: 16, 114, 800 -
        models/noise.py::chained_sum_noise_degree).  The reference's own
        ignored long test runs such folds anyway and passes only
        statistically; here the key is pinned to S(0)=0, the half of the
        keyspace NOISE.md proves decrypts ANY circuit correctly - so the
        asserts are sound, not lucky."""
        from homomorph_tpu.models import circuits

        ctx = make_ctx(256, 128, 1, 128, seed=2)  # seed 2: S(0)=0 (verified)
        assert int(np.asarray(ctx.get_secret_key().limbs)[0] & 1) == 0
        vals = [int(v) for v in rng.integers(0, 256, size=4)]
        acc = ctx.encrypt(vals[0], hm.U8)
        total = vals[0]
        for v in vals[1:]:
            acc = circuits.add(acc, ctx.encrypt(v, hm.U8))
            total = (total + v) & 0xFF
            assert ctx.decrypt(acc) == total
        # >100k-bit ciphertexts actually ran (153,600-bit bound at fold 3)
        assert acc.num_limbs * 32 > 100_000

    def test_multiplication_reference_params(self, rng):
        """The reference's exact mul config (128,64,1,64; benches/u8.rs).

        Round-4 history: this config was beyond the provable envelope of
        BOTH circuits (tree bound then 148 > d=128) and decrypted only on
        S(0)=0 keys.  The round-5 majority-form ripple tightened the tree
        bound to 64 < 128, so the reference's own bench config is now
        PROVABLY SOUND through the checked API - on every key, no seed
        pinning needed.  The reference circuit's replay (152 > 128) still
        exceeds it, so the same config through mul_unsigned_ref remains
        in statistically-lucky territory; that claim stays pinned in
        test_noise_bounds.py."""
        from homomorph_tpu.models import noise as N

        ctx = make_ctx(128, 64, 1, 64, seed=2)
        a, b = ctx.encrypt(6, hm.U8), ctx.encrypt(7, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == 42
        assert N.mul_ref_noise_degree(8, 1) > 128  # ref circuit: still out


class TestExtensions:
    """Ops beyond the reference's set: sub / neg / eq / trivial constants."""

    @pytest.fixture(scope="class")
    def ctx(self):
        import homomorph_tpu as hm

        c = hm.Context(hm.Parameters(64, 16, 1, 16), encrypt_seed=11)
        c.generate_secret_key()
        c.generate_public_key()
        return c

    def test_subtraction(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicSubtraction

        a = ctx.encrypt([200, 7, 0, 13], hm.U8, batch=True)
        b = ctx.encrypt([58, 9, 1, 13], hm.U8, batch=True)
        got = ctx.decrypt(ctx.apply2(HomomorphicSubtraction, a, b))
        want = [(200 - 58) & 0xFF, (7 - 9) & 0xFF, (0 - 1) & 0xFF, 0]
        assert [int(v) for v in got] == want

    def test_subtraction_signed(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicSubtraction

        a = ctx.encrypt([-5, 100], hm.I8, batch=True)
        b = ctx.encrypt([7, -27], hm.I8, batch=True)
        got = ctx.decrypt(ctx.apply2(HomomorphicSubtraction, a, b))
        assert [int(v) for v in got] == [-12, 127]

    def test_negation(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicNegation

        a = ctx.encrypt([-5, 0, 42, -128], hm.I8, batch=True)
        got = ctx.decrypt(ctx.apply1(HomomorphicNegation, a))
        assert [int(v) for v in got] == [5, 0, -42, -128]  # -(-128) wraps

    def test_equality(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicEquality

        a = ctx.encrypt([42, 42, 0, 255], hm.U8, batch=True)
        b = ctx.encrypt([42, 43, 0, 254], hm.U8, batch=True)
        got = ctx.decrypt(ctx.apply2(HomomorphicEquality, a, b))
        assert [bool(v) for v in got] == [True, False, True, False]

    def test_equality_requires_d_over_delta(self):
        # Width-aware requirement: u8 equality needs d/delta >= 17
        # (= 2*8 + 1; exact noise bound, see HomomorphicEquality docs).
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicEquality
        from homomorph_tpu.utils.errors import InvalidParametersError

        c = hm.Context(hm.Parameters(64, 8, 8, 8), encrypt_seed=3)  # ratio 8
        c.generate_secret_key()
        c.generate_public_key()
        a = c.encrypt(1, hm.U8)
        b = c.encrypt(1, hm.U8)
        with pytest.raises(InvalidParametersError):
            c.apply2(HomomorphicEquality, a, b)
        # without operands, validate uses the all-widths class constant
        with pytest.raises(InvalidParametersError):
            c.validate_operation(HomomorphicEquality)

    def test_equality_width_aware_narrow(self):
        # u8 at d/delta = 20 passes the checked API (the all-widths blanket
        # 257 would have rejected it) and decrypts correctly with margin:
        # noise degree 8*(delta+1) = 72 < d = 160.
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicEquality

        c = hm.Context(hm.Parameters(160, 8, 8, 8), encrypt_seed=4)
        c.generate_secret_key()
        c.generate_public_key()
        a = c.encrypt([9, 200], hm.U8, batch=True)
        b = c.encrypt([9, 201], hm.U8, batch=True)
        got = c.decrypt(c.apply2(HomomorphicEquality, a, b))
        assert [bool(v) for v in got] == [True, False]

    def test_equality_width_requirement_is_sound_at_boundary(self):
        """At the minimum checked parameters (d = 17*delta for u8) the
        result must decrypt correctly - the requirement embeds the exact
        noise bound n*(delta+1) < d, unlike the old width-only rule which
        admitted parameters that failed depending on keygen randomness."""
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicEquality

        for seed in range(3):  # fresh random keys each time
            c = hm.Context(hm.Parameters(17 * 8, 8, 8, 8))
            c.generate_secret_key()
            c.generate_public_key()
            c.validate_operation(
                HomomorphicEquality, c.encrypt(0, hm.U8), c.encrypt(0, hm.U8)
            )
            a = c.encrypt([77, 78], hm.U8, batch=True)
            b = c.encrypt([77, 200], hm.U8, batch=True)
            got = c.decrypt(c.apply2(HomomorphicEquality, a, b))
            assert [bool(v) for v in got] == [True, False], seed

    def test_equality_u128_through_checked_api(self):
        # u128 equality usable via apply2 at valid params (VERDICT item:
        # the old blanket MIN_D_OVER_DELTA=64 made this impossible).
        # Required ratio 2*128+1 = 257; delta=1 -> d >= 257.
        import homomorph_tpu as hm
        from homomorph_tpu.cipher import Ciphered
        from homomorph_tpu.models import HomomorphicEquality

        c = hm.Context(hm.Parameters(512, 8, 1, 8), encrypt_seed=5)
        c.generate_secret_key()
        c.generate_public_key()
        x = (1 << 127) + 12345
        # trivial (degree-0) ciphertexts keep the 128-lane AND tree cheap on
        # CPU while still exercising the full checked apply2 path
        a = Ciphered.trivial(x, hm.U128)
        b_eq = Ciphered.trivial(x, hm.U128)
        b_ne = Ciphered.trivial(x ^ (1 << 100), hm.U128)
        assert bool(c.decrypt(c.apply2(HomomorphicEquality, a, b_eq)))
        assert not bool(c.decrypt(c.apply2(HomomorphicEquality, a, b_ne)))

    def test_trivial_constant_mix(self, ctx):
        """Public constants mix into circuits without the public key."""
        import homomorph_tpu as hm
        from homomorph_tpu.cipher import Ciphered
        from homomorph_tpu.models import circuits

        a = ctx.encrypt([10, 250], hm.U8, batch=True)
        k = Ciphered.trivial(32, hm.U8)
        got = circuits.add(a, k).decipher(ctx.get_secret_key())
        assert [int(v) for v in got] == [42, (250 + 32) & 0xFF]

    def test_trivial_roundtrip_no_keys(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.cipher import Ciphered

        t = Ciphered.trivial([1, 2, 3], hm.U16, batch=True)
        got = t.decipher(ctx.get_secret_key())
        assert [int(v) for v in got] == [1, 2, 3]

    def test_comparisons(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicGreaterThan, HomomorphicLessThan

        a = ctx.encrypt([5, 200, 7, 0], hm.U8, batch=True)
        b = ctx.encrypt([9, 200, 3, 255], hm.U8, batch=True)
        lt = ctx.decrypt(ctx.apply2(HomomorphicLessThan, a, b))
        gt = ctx.decrypt(ctx.apply2(HomomorphicGreaterThan, a, b))
        assert [bool(v) for v in lt] == [True, False, False, True]
        assert [bool(v) for v in gt] == [False, False, True, False]

    def test_le_ge(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.models import circuits

        sk = ctx.get_secret_key()
        a = ctx.encrypt([5, 200, 7], hm.U8, batch=True)
        b = ctx.encrypt([9, 200, 3], hm.U8, batch=True)
        le = circuits.le(a, b).decipher(sk)
        ge = circuits.ge(a, b).decipher(sk)
        assert [bool(v) for v in le] == [True, True, False]
        assert [bool(v) for v in ge] == [False, True, True]

    def test_select(self, ctx):
        import homomorph_tpu as hm
        from homomorph_tpu.models import circuits

        sk = ctx.get_secret_key()
        a = ctx.encrypt([10, 20], hm.U8, batch=True)
        b = ctx.encrypt([30, 40], hm.U8, batch=True)
        cond = circuits.lt(a, b)  # both True
        got = circuits.select(cond[0], a, b).decipher(sk)
        assert [int(v) for v in got] == [10, 20]
        cond2 = circuits.gt(a, b)  # both False
        got2 = circuits.select(cond2[0], a, b).decipher(sk)
        assert [int(v) for v in got2] == [30, 40]


@pytest.mark.slow
class TestWideMultiplication:
    """Degree-growth stress (SURVEY §7 hard parts): multiplication beyond
    the reference's u8 bench width."""

    def _s0_zero_ctx(self, seed):
        """Wide multiplication at SMALL d: the u16 tree bound is 416 at
        delta=1 (models/noise.py) - sound params exist (d >= 417) but
        these stress tests run the reference-bench-style d=128, far beyond
        the envelope, where decryption is correct exactly on keys with
        S(0) = 0 (verified in test_noise_bounds.py).  Unchecked path with
        pinned S(0)=0 keys (seeds 2/5, verified below)."""
        import numpy as np

        import homomorph_tpu as hm

        ctx = hm.Context(hm.Parameters(128, 16, 1, 16), source=hm.ThreefrySource(seed))
        ctx.generate_secret_key()
        ctx.generate_public_key()
        assert int(np.asarray(ctx.get_secret_key().limbs)[0] & 1) == 0
        return ctx

    def test_u16_mul(self):
        import homomorph_tpu as hm
        from homomorph_tpu.models import HomomorphicMultiplication, circuits

        ctx = self._s0_zero_ctx(2)
        xs = [3, 257, 65535]
        ys = [5, 255, 3]
        a = ctx.encrypt(xs, hm.U16, batch=True)
        b = ctx.encrypt(ys, hm.U16, batch=True)
        # d=128 is below the u16 tree bound (417) - rejected
        with pytest.raises(hm.InvalidParametersError):
            ctx.apply2(HomomorphicMultiplication, a, b)
        got = ctx.decrypt(circuits.mul_unsigned(a, b))
        assert [int(v) for v in got] == [
            (x * y) & 0xFFFF for x, y in zip(xs, ys)
        ]

    def test_i16_mul_negative(self):
        import homomorph_tpu as hm
        from homomorph_tpu.models import circuits

        ctx = self._s0_zero_ctx(5)
        xs = [-3, 300]
        ys = [5, -100]
        a = ctx.encrypt(xs, hm.I16, batch=True)
        b = ctx.encrypt(ys, hm.I16, batch=True)
        got = ctx.decrypt(circuits.mul_signed(a, b))
        def wrap(v):
            v &= 0xFFFF
            return v - 0x10000 if v >= 0x8000 else v
        assert [int(v) for v in got] == [wrap(x * y) for x, y in zip(xs, ys)]


class TestAllWidthGates:
    """The reference instantiates gate tests for every primitive type via
    macros (uint.rs/int.rs); here one parametrized test covers the same
    matrix (gates are lane-parallel, so every width runs at tiny params)."""

    WIDE = [
        ("U16", 0xA5A5, 0x0FF0), ("U32", 0xDEADBEEF, 0x0F0F0F0F),
        ("U64", (1 << 63) | 0xABC, 0xFFF), ("U128", (1 << 127) | 7, (1 << 100) | 7),
        ("I16", -12345, 0x0FF0), ("I32", -(1 << 30), 0x0F0F0F0F),
        ("I64", -(1 << 62), 0xFFF), ("I128", -(1 << 120), (1 << 99) | 3),
        ("Usize", (1 << 60) | 9, 0xF0F0), ("Isize", -(1 << 60), 0xF0F0),
    ]

    @pytest.mark.parametrize("tname,x,y", WIDE, ids=[w[0] for w in WIDE])
    def test_gates_all_widths(self, tname, x, y):
        import homomorph_tpu as hm
        from homomorph_tpu.models import (
            HomomorphicAndGate,
            HomomorphicNotGate,
            HomomorphicXorGate,
        )

        desc = getattr(hm, tname)
        nbits = desc.num_bits
        mask = (1 << nbits) - 1

        def to_signed(v):
            v &= mask
            return v - (1 << nbits) if desc.signed and v >> (nbits - 1) else v

        ctx = make_ctx(40, 8, 8, 8, seed=hash(tname) % 1000)
        a, b = ctx.encrypt(x, desc), ctx.encrypt(y, desc)
        got_and = int(ctx.decrypt(ctx.apply2(HomomorphicAndGate, a, b)))
        got_xor = int(ctx.decrypt(ctx.apply2(HomomorphicXorGate, a, b)))
        got_not = int(ctx.decrypt(ctx.apply1(HomomorphicNotGate, a)))
        assert got_and == to_signed(x & y)
        assert got_xor == to_signed(x ^ y)
        assert got_not == to_signed(~x)


@pytest.mark.slow
class TestWideAddition:
    def test_u64_add(self):
        # add_noise_degree(64, 1) = 128 -> d = 512 suffices (uint.rs's wide
        # long tests run at comparable production-ish params)
        ctx = make_ctx(512, 16, 1, 16, seed=71)
        x, y = (1 << 63) | 123456789, (1 << 62) | 987654321
        a, b = ctx.encrypt(x, hm.U64), ctx.encrypt(y, hm.U64)
        got = int(ctx.decrypt(ctx.apply2(HomomorphicAddition, a, b)))
        assert got == (x + y) & ((1 << 64) - 1)
