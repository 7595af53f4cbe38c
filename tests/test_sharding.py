"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu.gf2 import poly as gf2
from homomorph_tpu.parallel import bulk, make_mesh


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def keyed():
    ctx = hm.Context(hm.Parameters(32, 8, 1, 8), source=hm.ThreefrySource(31))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    return ctx


def _roundtrip(cfg, ctx, B=16, n=8):
    params = ctx.parameters
    pk, sk = ctx.get_public_key(), ctx.get_secret_key()
    L = gf2.limbs_for(params.pk_degree)
    rng = np.random.default_rng(0)
    plain = rng.integers(0, 2, size=(B, n)).astype(np.uint32)
    sel = rng.integers(0, 2, size=(B, n, params.tau)).astype(np.uint8)
    limbs = bulk.sharded_encrypt_bits(
        cfg, jnp.asarray(sel), pk.bit_planes(), jnp.asarray(plain), L
    )
    w = sk.decrypt_mask(L)
    out = bulk.sharded_decrypt_bits(cfg, limbs, w)
    assert (np.asarray(out) == plain).all()
    return limbs


@needs_8
def test_data_parallel_roundtrip(keyed):
    cfg = make_mesh(8, 1)
    _roundtrip(cfg, keyed)


@needs_8
def test_tau_sharded_roundtrip(keyed):
    """tau-sharded pk: partial popcounts combined via psum - must be exact."""
    cfg = make_mesh(4, 2)
    _roundtrip(cfg, keyed)


@needs_8
def test_tau_only_sharding(keyed):
    cfg = make_mesh(1, 8)
    _roundtrip(cfg, keyed)


@needs_8
def test_sharded_matches_single_device(keyed):
    """Sharded encrypt must be bit-identical to the single-chip path."""
    ctx = keyed
    params = ctx.parameters
    pk = ctx.get_public_key()
    L = gf2.limbs_for(params.pk_degree)
    rng = np.random.default_rng(5)
    B, n = 16, 8
    plain = rng.integers(0, 2, size=(B, n)).astype(np.uint32)
    sel = rng.integers(0, 2, size=(B, n, params.tau)).astype(np.uint8)

    from homomorph_tpu.cipher import _encrypt_core

    single = _encrypt_core(jnp.asarray(sel), pk.bit_planes(), jnp.asarray(plain), L)
    for shape in [(8, 1), (4, 2), (2, 4)]:
        cfg = make_mesh(*shape)
        sharded = bulk.sharded_encrypt_bits(
            cfg, jnp.asarray(sel), pk.bit_planes(), jnp.asarray(plain), L
        )
        assert (np.asarray(single) == np.asarray(sharded)).all(), shape


@needs_8
def test_sharded_gate_xor(keyed):
    cfg = make_mesh(8, 1)
    limbs = _roundtrip(cfg, keyed)
    x = bulk.sharded_gate_xor(cfg, limbs, limbs)
    assert (np.asarray(x) == 0).all()  # c ^ c = trivial encryption of 0


@needs_8
def test_graft_dryrun():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


class TestShardedContext:
    """Context(sharding=cfg): the distributed production surface."""

    @needs_8
    def test_encrypt_decrypt_through_sharded_context(self):
        cfg = make_mesh(4, 2)
        ctx = hm.Context(hm.Parameters(64, 16, 1, 16), sharding=cfg)
        ctx.generate_secret_key()
        ctx.generate_public_key()
        xs = list(range(40, 48))  # 8 values, divisible by data axis (4)
        c = ctx.encrypt(xs, hm.U8, batch=True)
        # ciphertext lives sharded over the mesh's data axis
        spec = c.limbs.sharding.spec
        assert spec[0] == "data", spec
        assert [int(v) for v in ctx.decrypt(c)] == xs

    @needs_8
    def test_sharded_matches_unsharded_plaintexts(self):
        cfg = make_mesh(8, 1)
        p = hm.Parameters(64, 16, 1, 16)
        keygen = hm.Context(p, source=hm.ThreefrySource(13))
        keygen.generate_secret_key()
        keygen.generate_public_key()
        sk_b = keygen.get_secret_key().to_bytes()
        pk_b = keygen.get_public_key().to_bytes()

        sharded = hm.Context(p, encrypt_seed=5, sharding=cfg)
        sharded.set_secret_key(hm.SecretKey.from_bytes(sk_b))
        sharded.set_public_key(hm.PublicKey.from_bytes(pk_b))
        plain = hm.Context(p, encrypt_seed=5)
        plain.set_secret_key(hm.SecretKey.from_bytes(sk_b))
        plain.set_public_key(hm.PublicKey.from_bytes(pk_b))

        xs = [7, 200, 0, 255] * 2
        c_sh = sharded.encrypt(xs, hm.U8, batch=True)
        # same encrypt_seed, same pk -> identical ciphertext bits
        c_pl = plain.encrypt(xs, hm.U8, batch=True)
        np.testing.assert_array_equal(np.asarray(c_sh.limbs), np.asarray(c_pl.limbs))
        # cross-decrypt: the plain context decrypts the sharded ciphertext
        assert [int(v) for v in plain.decrypt(c_sh)] == xs

    @needs_8
    def test_homomorphic_op_on_sharded_ciphertexts(self):
        from homomorph_tpu.models import HomomorphicAddition

        cfg = make_mesh(4, 2)
        ctx = hm.Context(hm.Parameters(64, 16, 1, 16), sharding=cfg)
        ctx.generate_secret_key()
        ctx.generate_public_key()
        a = ctx.encrypt([10, 20, 30, 40], hm.U8, batch=True)
        b = ctx.encrypt([1, 2, 3, 4], hm.U8, batch=True)
        s = ctx.apply2(HomomorphicAddition, a, b)
        assert [int(v) for v in ctx.decrypt(s)] == [11, 22, 33, 44]

    @needs_8
    def test_indivisible_batch_rejected(self):
        cfg = make_mesh(8, 1)
        ctx = hm.Context(hm.Parameters(64, 16, 1, 16), sharding=cfg)
        ctx.generate_secret_key()
        ctx.generate_public_key()
        with pytest.raises(ValueError, match="not divisible"):
            ctx.encrypt([1, 2, 3], hm.U8, batch=True)

    @needs_8
    def test_single_value_bypasses_sharding(self):
        cfg = make_mesh(8, 1)
        ctx = hm.Context(hm.Parameters(64, 16, 1, 16), sharding=cfg)
        ctx.generate_secret_key()
        ctx.generate_public_key()
        c = ctx.encrypt(99, hm.U8)  # batch=False -> plain single-device path
        assert int(ctx.decrypt(c)) == 99


class TestReviewRegressions:
    def test_source_plus_sharding_rejected(self):
        cfg = make_mesh(2, 1, devices=jax.devices()[:2])
        with pytest.raises(ValueError, match="incompatible"):
            hm.Context(
                hm.Parameters(64, 16, 1, 16),
                source=hm.ThreefrySource(1),
                sharding=cfg,
            )

    @needs_8
    def test_bulk_decrypt_composes_with_limb_mesh(self, monkeypatch):
        """The limb-mesh clmul dispatcher must stay inert inside the bulk
        pipeline's shard_map bodies (nested shard_map over a different
        mesh fails at trace time) - review finding."""
        from jax.sharding import Mesh
        from homomorph_tpu.gf2 import poly as gf2
        from homomorph_tpu.parallel import limbmul

        monkeypatch.setattr(limbmul, "_SHARD_MIN_BLOCK", 1)
        cfg = make_mesh(2, 1, devices=jax.devices()[:2])
        lmesh = Mesh(np.array(jax.devices()[2:6]), (limbmul.LIMB_AXIS,))
        ctx = hm.Context(hm.Parameters(64, 16, 1, 16), encrypt_seed=3)
        ctx.generate_secret_key()
        ctx.generate_public_key()
        pk, sk = ctx.get_public_key(), ctx.get_secret_key()
        L = gf2.limbs_for(ctx.parameters.pk_degree)
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, size=(4, 8)).astype(np.uint32))
        sel = jnp.asarray(
            rng.integers(0, 2, size=(4, 8, ctx.parameters.tau)).astype(np.uint8)
        )
        with limbmul.use_limb_mesh(lmesh):
            ct = bulk.sharded_encrypt_bits(cfg, sel, pk.bit_planes(), bits, L)
            out = bulk.sharded_decrypt_bits(cfg, ct, sk.decrypt_mask(L))
        assert (np.asarray(out) == np.asarray(bits)).all()


class TestShardedCheckpoint:
    """save_sharded/load_sharded (parallel.distributed): per-shard
    checkpoint of a sharded ciphertext + manifest, restored host-side."""

    def test_roundtrip_preserves_limbs_and_metadata(self, keyed, tmp_path):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from homomorph_tpu.models import circuits
        from homomorph_tpu.parallel import distributed

        ctx = keyed
        a = ctx.encrypt([3, 250, 17, 9], hm.U8, batch=True)
        b = ctx.encrypt([5, 6, 7, 8], hm.U8, batch=True)
        s = circuits.gate_xor(a, b)  # composed: nonzero tracked noise
        cfg = make_mesh(4, 1, devices=jax.devices()[:4])
        sharded = hm.Ciphered(
            jax.device_put(
                s.limbs, NamedSharding(cfg.mesh, P("data", None, None))
            ),
            s.bound,
            s.desc,
            noise=s.noise,
        )
        distributed.save_sharded(str(tmp_path), sharded, name="ck")
        back = distributed.load_sharded(str(tmp_path), hm.U8, name="ck")
        assert np.array_equal(np.asarray(back.limbs), np.asarray(s.limbs))
        assert back.bound == s.bound and back.noise == s.noise
        out = [int(v) for v in ctx.decrypt(back)]
        assert out == [3 ^ 5, 250 ^ 6, 17 ^ 7, 9 ^ 8]

    def test_wrong_desc_and_missing_shards(self, keyed, tmp_path):
        from homomorph_tpu.parallel import distributed

        ctx = keyed
        c = ctx.encrypt([1, 2], hm.U8, batch=True)
        distributed.save_sharded(str(tmp_path), c, name="ck")
        with pytest.raises(hm.DeserializeError, match="was u8"):
            distributed.load_sharded(str(tmp_path), hm.U16, name="ck")
        # delete a shard file: incomplete checkpoints must refuse to load
        import os

        for fn in os.listdir(tmp_path):
            if fn.endswith(".npz"):
                os.remove(tmp_path / fn)
                break
        with pytest.raises(hm.DeserializeError, match="incomplete"):
            distributed.load_sharded(str(tmp_path), hm.U8, name="ck")
