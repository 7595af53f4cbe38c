"""Carry-save tree multiplier: plan structure, semantics vs the reference
circuit (the oracle, common.rs:66-163), signedness, and noise bounds."""

import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu.models import HomomorphicMultiplication, circuits, noise
from homomorph_tpu.models.csaplan import TREE_MIN_WIDTH, csa_plan


def make_ctx(d, dp, delta, tau, seed=0):
    ctx = hm.Context(hm.Parameters(d, dp, delta, tau), source=hm.ThreefrySource(seed))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    return ctx


class TestPlanStructure:
    """The static plan is the single source of truth for both the circuit
    and the noise replay - its invariants are load-bearing."""

    @pytest.mark.parametrize("n", [8, 11, 16, 32, 64])
    def test_every_bit_consumed_exactly_once(self, n):
        plan = csa_plan(n)
        produced = {i * n + j for i in range(n) for j in range(n - i)}
        consumed = []
        for level in plan.levels:
            for op in level:
                consumed.extend(x for x in (op.x, op.y, op.z) if x is not None)
                produced.add(op.sum)
                if op.carry is not None:
                    produced.add(op.carry)
        final = [b for col in plan.final_cols for b in col]
        # no bit is fed into two compressors, none is both input and output
        assert len(consumed) == len(set(consumed))
        # every produced bit is either consumed later or in the final rows
        assert set(consumed) | set(final) == produced
        assert not set(consumed) & set(final)

    @pytest.mark.parametrize("n", [8, 16, 32, 64, 128])
    def test_log_depth_and_two_rows(self, n):
        plan = csa_plan(n)
        # Dadda converges in ~log_1.5(n) levels; the drip-free bound below
        # fails if the half-adder rule regresses (pure-FA plans take n-2)
        assert len(plan.levels) <= 2 * n.bit_length()
        assert all(len(col) <= 2 for col in plan.final_cols)
        assert all(len(col) >= 1 for col in plan.final_cols)

    def test_wrapping_drops_only_top_column(self):
        plan = csa_plan(16)
        for level in plan.levels:
            for op in level:
                assert (op.carry is None) == (op.col == 15)

    def test_noise_bound_values(self):
        # exact replays of the shipped circuit (snapshot: a silent change
        # in the plan or replay shows up here first)
        assert noise.mul_noise_degree(8, 1) == 64
        assert noise.mul_noise_degree(16, 1) == 416
        assert noise.mul_noise_degree(32, 1) == 2384
        assert noise.mul_noise_degree(64, 1) == 13372
        assert noise.mul_ref_noise_degree(8, 1) == 152
        assert noise.mul_ref_noise_degree(16, 1) == 19348
        # below the crossover the circuit (and so the bound) is the
        # reference accumulation; with the round-5 majority ripple the
        # tree is never worse, so the crossover moved 8 -> 4 (n=2/3 tie)
        assert TREE_MIN_WIDTH == 4
        for w in range(1, TREE_MIN_WIDTH):
            assert noise.mul_noise_degree(w, 1) == noise.mul_ref_noise_degree(w, 1)
        # at the old crossover the tree now strictly wins
        assert noise.mul_noise_degree(4, 1) == 12 < noise.mul_ref_noise_degree(4, 1)
        # delta scaling: every planned degree is a multiple of delta+1
        assert noise.mul_noise_degree(8, 3) == 64 * 2


class TestTreeVsReferenceOracle:
    """The tree computes a DIFFERENT polynomial circuit; the contract is
    equal decryption, verified against the reference accumulation AND the
    plaintext product."""

    @pytest.fixture(scope="class")
    def ctx(self):
        # d/delta = 160 >= 149, the exact tree bound for u8
        return make_ctx(160, 16, 1, 16, seed=6)

    def test_u8_batch(self, ctx):
        xs = [0, 1, 6, 13, 99, 250, 255, 170]
        ys = [7, 255, 7, 11, 201, 3, 255, 85]
        a = ctx.encrypt(xs, hm.U8, batch=True)
        b = ctx.encrypt(ys, hm.U8, batch=True)
        want = [(x * y) & 0xFF for x, y in zip(xs, ys)]
        tree = [int(v) for v in ctx.decrypt(circuits.mul_unsigned(a, b))]
        ref = [int(v) for v in ctx.decrypt(circuits.mul_unsigned_ref(a, b))]
        assert tree == want
        assert ref == want

    def test_i8_signed_edges(self, ctx):
        xs = [-6, -6, -128, -1, 127]
        ys = [7, -7, -1, -1, 127]
        a = ctx.encrypt(xs, hm.I8, batch=True)
        b = ctx.encrypt(ys, hm.I8, batch=True)
        def wrap(v):
            return ((v + 128) % 256) - 128
        want = [wrap(x * y) for x, y in zip(xs, ys)]
        tree = [int(v) for v in ctx.decrypt(circuits.mul_signed(a, b))]
        ref = [int(v) for v in ctx.decrypt(circuits.mul_signed_ref(a, b))]
        assert tree == want
        assert ref == want

    def test_lanes_api_matches(self, ctx):
        a = ctx.encrypt(23, hm.U8)
        b = ctx.encrypt(11, hm.U8)
        lanes = circuits.mul_unsigned_lanes(list(a), list(b))
        got = ctx.decrypt(hm.Ciphered.new_from_raw(lanes, hm.U8))
        assert got == 253  # (23*11) & 0xFF

    def test_checked_api_routes_through_tree(self, ctx):
        a, b = ctx.encrypt(6, hm.U8), ctx.encrypt(7, hm.U8)
        assert ctx.decrypt(ctx.apply2(HomomorphicMultiplication, a, b)) == 42


class TestRequirements:
    def test_width_aware_tree_bounds(self):
        class Lanes:
            noise = 2  # fresh (cipher.FRESH_NOISE)

            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

        req = HomomorphicMultiplication.requirement_for
        assert req(Lanes(8), Lanes(8)) == 65
        # the headline capability unlock: u16/u32/u64 products now clear
        # the checked API at representable d (the reference circuit needed
        # 19,349 / 4.4e8 / 3.9e17; round 4's m-form ripple needed
        # 149 / 1,013 / 5,873 / 33,377)
        assert req(Lanes(16), Lanes(16)) == 417
        assert req(Lanes(32), Lanes(32)) == 2385
        assert req(Lanes(64), Lanes(64)) == 13373
        assert req(Lanes(64), Lanes(64)) < 65536  # fits u16 d

    def test_u16_mul_accepted_at_sound_params(self):
        # validation-only: execution is exercised by the slow suite;
        # here we check the gate opens exactly at the bound
        ctx = hm.Context(hm.Parameters(417, 1, 1, 2))
        t = hm.Ciphered.trivial(3, hm.U16)
        # stamp FRESH noise on the trivial stand-in: round-4 noise
        # tracking correctly gives genuinely-trivial operands a LOWER
        # requirement (their products carry zero noise), which is not
        # what this gate-position test probes
        a = hm.Ciphered(t.limbs, t.bound, t.desc, noise=2)
        ctx.validate_operation(HomomorphicMultiplication, a, a)  # no raise
        below = hm.Context(hm.Parameters(416, 1, 1, 2))
        with pytest.raises(hm.InvalidParametersError):
            below.apply2(HomomorphicMultiplication, a, a)
        # and the trivial-operand requirement really is lower now
        assert HomomorphicMultiplication.requirement_for(t, t) < 417


class TestSumAndPopcount:
    """N-ary sum + popcount: the carry-save machinery on non-multiplier
    inputs, through both the circuits and the checked N-ary trait."""

    @pytest.fixture(scope="class")
    def ctx(self):
        # sum of 4 u8s needs d/delta >= 93; popcount u8 needs 31
        return make_ctx(128, 16, 1, 16, seed=9)

    def test_sum_many_u8(self, ctx):
        cols = [[6, 200, 17], [7, 55, 3], [42, 1, 255], [99, 0, 8]]
        ops = [ctx.encrypt(c, hm.U8, batch=True) for c in cols]
        want = [sum(v) & 0xFF for v in zip(*cols)]
        got = [int(v) for v in ctx.decrypt(circuits.sum_many(ops))]
        assert got == want
        # NB: folding the binary adder over these four operands is NOT a
        # usable oracle here - the chained fold replays to worst noise
        # degree 6,956 >> d=128 (noise.chained_sum_noise_degree(8,1,4)),
        # so on this S(0)=1 key it decrypts garbage while the tree (92)
        # stays comfortably inside the envelope.  Verified: the fold
        # produced [154, 0, 91] against the true [154, 0, 27] when this
        # test originally asserted it - the advantage the op exists for.

    def test_sum_through_apply_n(self, ctx):
        from homomorph_tpu.models import HomomorphicSum

        ops = [ctx.encrypt(v, hm.U8) for v in (10, 20, 30)]
        assert ctx.decrypt(ctx.apply_n(HomomorphicSum, ops)) == 60
        # requirement is (width, count)-aware
        assert HomomorphicSum.requirement_for(*ops) == 27

    def test_sum_edge_cases(self, ctx):
        a = ctx.encrypt(41, hm.U8)
        assert ctx.decrypt(circuits.sum_many([a])) == 41
        b = ctx.encrypt(1, hm.U8)
        assert ctx.decrypt(circuits.sum_many([a, b])) == 42
        with pytest.raises(ValueError):
            circuits.sum_many([])
        with pytest.raises(ValueError):
            circuits.sum_many([a, ctx.encrypt(1, hm.U16)])

    def test_popcount_u8(self, ctx):
        from homomorph_tpu.models import HomomorphicPopCount

        vals = [0, 1, 3, 0b10110101, 255, 128]
        a = ctx.encrypt(vals, hm.U8, batch=True)
        want = [bin(v).count("1") for v in vals]
        got = [int(v) for v in ctx.decrypt(circuits.popcount(a))]
        assert got == want
        b = ctx.encrypt(0b01101100, hm.U8)
        assert ctx.decrypt(ctx.apply1(HomomorphicPopCount, b)) == 4
        assert HomomorphicPopCount.requirement_for(b) == 17

    def test_sum_noise_tree_vs_chained(self):
        from homomorph_tpu.models import noise

        assert noise.sum_noise_degree(8, 1, 8) == 72
        assert noise.chained_sum_noise_degree(8, 1, 8) > 10**6
        # k<=2 dispatches to the plain adder (both circuit and bound)
        assert noise.sum_noise_degree(8, 1, 2) == noise.add_noise_degree(8, 1)

    def test_popcount_composes_downstream(self):
        # upper lanes are real ciphertext zeros: compare the count.
        # Composition degree: popcount lanes (<=30) feed the compare
        # tree's eq-products (~8x) -> worst ~242, so d=256 keeps the
        # whole pipeline inside the envelope for every key.
        ctx = make_ctx(256, 16, 1, 16, seed=11)
        a = ctx.encrypt(0b11110111, hm.U8)  # popcount 7
        b = ctx.encrypt(5, hm.U8)
        c = circuits.gt(circuits.popcount(a), b)
        assert bool(ctx.decrypt(c)) is True


class TestTreeNoiseEmpirical:
    """Run the tree on simulated noise lanes: measured worst degree must
    stay within the replayed bound (soundness) and, at u16, far below the
    reference circuit's (the tightening is real, not bookkeeping)."""

    def _lanes(self, n, rng, batch=4):
        from homomorph_tpu.cipher import Ciphered
        from homomorph_tpu.gf2 import poly as gf2
        import jax.numpy as jnp

        delta = 1
        L = gf2.limbs_for(delta + 1)
        limbs = rng.integers(0, 1 << 32, size=(batch, n, L), dtype=np.uint64)
        limbs = limbs.astype(np.uint32)
        limbs[..., -1] &= np.uint32(0b111)  # degree <= delta+1 = 2
        return Ciphered(jnp.asarray(limbs), delta + 1, hm.BytesDescriptor(n // 8))

    def test_u8_within_bound(self):
        from homomorph_tpu.gf2 import poly as gf2

        rng = np.random.default_rng(7)
        p = circuits.mul_unsigned(self._lanes(8, rng), self._lanes(8, rng))
        got = int(np.asarray(gf2.compute_degree(p.limbs)).max())
        assert got <= noise.mul_noise_degree(8, 1) == 64

    def test_u16_within_bound_and_below_reference(self):
        from homomorph_tpu.gf2 import poly as gf2

        rng = np.random.default_rng(8)
        p = circuits.mul_unsigned(self._lanes(16, rng, batch=2), self._lanes(16, rng, batch=2))
        got = int(np.asarray(gf2.compute_degree(p.limbs)).max())
        assert got <= noise.mul_noise_degree(16, 1) == 416
        # the reference circuit's bound is 19,348: the tree's degrees must
        # land far under it or the redesign bought nothing
        assert got < 2000
