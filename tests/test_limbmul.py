"""Limb-sharded clmul: correctness vs the dense kernel + dispatcher wiring.

SURVEY §5.7's sequence-parallel analogue: the large operand's limb axis is
sharded over the mesh, partial-product overhangs travel ONE ppermute hop.
Every test asserts bit-identity against the dense single-device
:func:`homomorph_tpu.gf2.kernels.clmul` (itself fuzzed against a big-int
oracle), across shard counts, odd paddings, and operand-size regimes,
including the automatic dispatch used by the homomorphic circuits
(reference hot-loop shape: src/polynomial.rs:252-310 at scale).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from homomorph_tpu.gf2 import kernels as gf2k
from homomorph_tpu.gf2 import poly as gf2
from homomorph_tpu.parallel import limbmul


def limb_mesh(n: int) -> Mesh:
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), (limbmul.LIMB_AXIS,))


def rand_limbs(rng, batch, L):
    return jnp.asarray(
        rng.integers(0, 1 << 32, size=(batch, L), dtype=np.uint64).astype(np.uint32)
    )


def assert_product_matches(a, b, mesh):
    want = np.asarray(gf2k.clmul(a, b))
    got = np.asarray(limbmul.sharded_clmul(a, b, mesh))
    np.testing.assert_array_equal(got, want)


class TestShardedClmul:
    @pytest.mark.parametrize("n_shards", [2, 4, 8])
    def test_matches_dense_across_shard_counts(self, rng, n_shards):
        mesh = limb_mesh(n_shards)
        a = rand_limbs(rng, 4, 96)   # large operand
        b = rand_limbs(rng, 4, 7)    # small operand
        assert_product_matches(a, b, mesh)

    @pytest.mark.parametrize(
        "La,Lb",
        [
            (64, 1),    # minimal small operand
            (65, 3),    # odd La: out_len 68 not divisible by shards
            (96, 12),   # K governed by out_len
            (17, 9),    # K governed by Lb floor (block >= Lb)
            (33, 33),   # balanced operands (block = Lb edge)
            (250, 31),  # odd everything
        ],
    )
    def test_odd_paddings(self, rng, La, Lb):
        mesh = limb_mesh(4)
        a = rand_limbs(rng, 3, La)
        b = rand_limbs(rng, 3, Lb)
        assert_product_matches(a, b, mesh)

    def test_top_limbs_dense(self, rng):
        """Data in the very last limbs of the big operand must not be
        dropped at the padded boundary."""
        mesh = limb_mesh(8)
        a = jnp.zeros((2, 80), dtype=jnp.uint32).at[:, -1].set(0xFFFFFFFF)
        b = rand_limbs(rng, 2, 5)
        assert_product_matches(a, b, mesh)

    def test_single_row_batch(self, rng):
        mesh = limb_mesh(2)
        assert_product_matches(rand_limbs(rng, 1, 128), rand_limbs(rng, 1, 4), mesh)

    def test_under_jit(self, rng):
        """Trace-safe: sharded_clmul composes under an outer jit."""
        mesh = limb_mesh(4)
        a = rand_limbs(rng, 2, 96)
        b = rand_limbs(rng, 2, 6)

        fn = jax.jit(lambda x, y: limbmul.sharded_clmul(x, y, mesh))
        np.testing.assert_array_equal(
            np.asarray(fn(a, b)), np.asarray(gf2k.clmul(a, b))
        )

    def test_comm_volume_in_compiled_hlo(self, rng):
        """The compiled program contains exactly ONE collective-permute and
        its operand is the [B, Lb] boundary spill - O(small operand)
        communication, independent of the sharded length."""
        mesh = limb_mesh(4)
        B, La, Lb = 2, 96, 6
        a = rand_limbs(rng, B, La)
        b = rand_limbs(rng, B, Lb)
        txt = (
            jax.jit(lambda x, y: limbmul.sharded_clmul(x, y, mesh))
            .lower(a, b)
            .compile()
            .as_text()
        )
        # the algorithm's own communication: exactly one ppermute, carrying
        # the [B, Lb] spill (other collectives in the dump are jit-boundary
        # resharding of the replicated test inputs/outputs)
        algo_lines = [
            ln
            for ln in txt.splitlines()
            if "collective-permute(" in ln and "ppermute" in ln
        ]
        assert len(algo_lines) == 1, algo_lines
        assert f"u32[{B},{Lb}]" in algo_lines[0], algo_lines[0]
        assert limbmul.comm_bytes_per_call(B, Lb, 4) == 3 * B * Lb * 4


class TestDispatcherIntegration:
    def test_maybe_sharded_declines_without_mesh(self, rng):
        assert limbmul.maybe_sharded_clmul(
            rand_limbs(rng, 2, 512), rand_limbs(rng, 2, 8)
        ) is None

    def test_maybe_sharded_declines_small_products(self, rng):
        with limbmul.use_limb_mesh(limb_mesh(4)):
            # Lg // n < _SHARD_MIN_BLOCK -> decline
            assert limbmul.maybe_sharded_clmul(
                rand_limbs(rng, 2, 32), rand_limbs(rng, 2, 4)
            ) is None

    def test_dispatcher_routes_large_products(self, rng, monkeypatch):
        monkeypatch.setattr(limbmul, "_SHARD_MIN_BLOCK", 8)
        a = rand_limbs(rng, 2, 200)
        b = rand_limbs(rng, 2, 6)
        want = np.asarray(gf2k.clmul(a, b))  # dense, no mesh
        with limbmul.use_limb_mesh(limb_mesh(4)):
            assert limbmul.maybe_sharded_clmul(a, b) is not None
            got = np.asarray(gf2k.clmul(a, b))  # same entry point, sharded
        np.testing.assert_array_equal(got, want)

    def test_operand_order_irrelevant(self, rng, monkeypatch):
        monkeypatch.setattr(limbmul, "_SHARD_MIN_BLOCK", 8)
        a = rand_limbs(rng, 2, 200)
        b = rand_limbs(rng, 2, 6)
        with limbmul.use_limb_mesh(limb_mesh(4)):
            got = np.asarray(gf2k.clmul(b, a))  # small x large
        np.testing.assert_array_equal(got, np.asarray(gf2k.clmul(b, a)))

    def test_broadcast_leading_dims(self, rng, monkeypatch):
        monkeypatch.setattr(limbmul, "_SHARD_MIN_BLOCK", 8)
        a = rand_limbs(rng, 6, 128).reshape(3, 2, 128)
        b = rand_limbs(rng, 1, 5)[0]  # rank-1, broadcasts
        want = np.asarray(gf2k.clmul(a, b))
        with limbmul.use_limb_mesh(limb_mesh(8)):
            got = np.asarray(gf2k.clmul(a, b))
        np.testing.assert_array_equal(got, want)

    def test_circuit_add_identical_under_limb_mesh(self, rng, monkeypatch):
        """End-to-end: a homomorphic adder at a large degree class produces
        bit-identical ciphertexts with and without the limb mesh."""
        import homomorph_tpu as hm
        from homomorph_tpu.models import circuits

        monkeypatch.setattr(limbmul, "_SHARD_MIN_BLOCK", 8)
        ctx = hm.Context(hm.Parameters(512, 512, 2, 16), source=hm.ThreefrySource(31))
        ctx.generate_secret_key()
        ctx.generate_public_key()
        a = ctx.encrypt([231, 77], hm.U8, batch=True)
        b = ctx.encrypt([140, 99], hm.U8, batch=True)
        dense = circuits.add(a, b)
        with limbmul.use_limb_mesh(limb_mesh(4)):
            sharded = circuits.add(a, b)
        np.testing.assert_array_equal(
            np.asarray(dense.limbs), np.asarray(sharded.limbs)
        )
        got = [int(v) for v in ctx.decrypt(sharded)]
        assert got == [(231 + 140) & 0xFF, (77 + 99) & 0xFF]
