"""Key and context tests (reference: src/context.rs:598-678)."""

import numpy as np
import pytest

import homomorph_tpu as hm


def make_ctx(params=None, seed=0):
    ctx = hm.Context(
        params or hm.Parameters(64, 32, 8, 32),
        source=hm.ThreefrySource(seed),
    )
    return ctx


class TestParameters:
    # src/context.rs:602-613
    def test_delta_ge_d_rejected(self):
        with pytest.raises(ValueError, match="delta < d"):
            hm.Parameters(6, 3, 6, 5)

    def test_zero_rejected(self):
        with pytest.raises(ValueError, match="strictly positive"):
            hm.Parameters(6, 0, 2, 5)

    def test_accessors(self):
        p = hm.Parameters(6, 3, 2, 5)
        assert (p.d, p.dp, p.delta, p.tau) == (6, 3, 2, 5)
        assert p.pk_degree == 9


class TestSecretKey:
    # src/context.rs:615-624
    def test_byte_roundtrip(self):
        sk = hm.SecretKey.from_bytes(bytes([5, 14, 8]))
        assert hm.SecretKey.from_bytes(sk.to_bytes()) == sk

    def test_zeroize(self):
        sk = hm.SecretKey.from_bytes(bytes([5, 14, 8]))
        sk.zeroize()
        with pytest.raises(hm.SecretKeyUnsetError):
            sk.to_bytes()

    def test_exact_degree(self):
        src = hm.ThreefrySource(3)
        for d in (5, 32, 64, 128, 256):
            sk = hm.SecretKey.random(d, src)
            assert sk.degree == d


class TestPublicKey:
    # src/context.rs:626-635
    def test_byte_roundtrip(self):
        pk = hm.PublicKey.from_bytes([bytes([4, 7, 5]), bytes([1, 2, 3]), bytes([5, 4, 6])])
        assert hm.PublicKey.from_bytes(pk.to_bytes()) == pk

    def test_generated_degrees(self):
        ctx = make_ctx()
        ctx.generate_secret_key()
        ctx.generate_public_key()
        pk = ctx.get_public_key()
        assert pk.tau == 32
        # every T_i has exact degree d + dp (leading terms forced)
        assert (pk.degrees == 64 + 32).all()


class TestContext:
    # src/context.rs:637-654
    def test_get_set_roundtrip(self):
        ctx = make_ctx()
        ctx.generate_secret_key()
        ctx.generate_public_key()
        sk, pk = ctx.get_secret_key(), ctx.get_public_key()
        ctx.set_secret_key(sk)
        ctx.set_public_key(pk)
        assert ctx.get_secret_key() == sk
        assert ctx.get_public_key() == pk

    # src/context.rs:656-667
    def test_set_secret_key_clears_public_key(self):
        ctx = make_ctx()
        ctx.generate_secret_key()
        ctx.generate_public_key()
        ctx.set_secret_key(ctx.get_secret_key())
        assert ctx.get_public_key() is None

    def test_generate_secret_key_clears_public_key(self):
        # src/context.rs:421-424
        ctx = make_ctx()
        ctx.generate_secret_key()
        ctx.generate_public_key()
        ctx.generate_secret_key()
        assert ctx.get_public_key() is None

    # src/context.rs:669-677
    def test_public_key_requires_secret_key(self):
        ctx = make_ctx()
        with pytest.raises(hm.SecretKeyUnsetError):
            ctx.generate_public_key()

    def test_encrypt_requires_public_key(self):
        ctx = make_ctx()
        ctx.generate_secret_key()
        with pytest.raises(hm.PublicKeyUnsetError):
            ctx.encrypt(1, hm.U8)

    def test_decrypt_requires_secret_key(self):
        ctx = make_ctx()
        ctx.generate_secret_key()
        ctx.generate_public_key()
        c = ctx.encrypt(1, hm.U8)
        ctx2 = make_ctx()
        with pytest.raises(hm.SecretKeyUnsetError):
            ctx2.decrypt(c)

    def test_cross_implementation_key_io(self):
        """Keys written by one context load into another and decrypt its
        ciphertexts (the persistence story, src/lib.rs:39-54)."""
        ctx = make_ctx(seed=11)
        ctx.generate_secret_key()
        ctx.generate_public_key()
        sk_bytes = ctx.get_secret_key().to_bytes()
        pk_bytes = ctx.get_public_key().to_bytes()

        ctx2 = make_ctx(seed=12)
        ctx2.set_secret_key(hm.SecretKey.from_bytes(sk_bytes))
        ctx2.set_public_key(hm.PublicKey.from_bytes(pk_bytes))
        c = ctx2.encrypt(177, hm.U8)
        assert ctx2.decrypt(c) == 177
        assert ctx.decrypt(c) == 177


class TestRandomnessDefaults:
    """Production randomness defaults (reference: every random byte from the
    OS CSPRNG - src/polynomial.rs:87, src/cipher.rs:95)."""

    def test_default_source_is_os_entropy(self):
        from homomorph_tpu.rng import OsRandomSource

        ctx = hm.Context(hm.Parameters(64, 32, 8, 32))
        assert isinstance(ctx._source, OsRandomSource)

    def test_default_contexts_draw_independent_keys(self):
        p = hm.Parameters(64, 32, 8, 32)
        c1, c2 = hm.Context(p), hm.Context(p)
        c1.generate_secret_key()
        c2.generate_secret_key()
        assert c1.get_secret_key() != c2.get_secret_key()

    def test_default_encrypt_streams_are_independent_and_correct(self):
        p = hm.Parameters(64, 32, 8, 32)
        ctx = hm.Context(p)
        ctx.generate_secret_key()
        ctx.generate_public_key()
        a = ctx.encrypt(177, hm.U8)
        b = ctx.encrypt(177, hm.U8)
        assert int(ctx.decrypt(a)) == 177 and int(ctx.decrypt(b)) == 177
        # fresh OS-entropy key per stream: same plaintext, different masks
        assert not np.array_equal(np.asarray(a.limbs), np.asarray(b.limbs))

    def test_encrypt_seed_seam_is_deterministic(self):
        p = hm.Parameters(64, 32, 8, 32)
        src = hm.ThreefrySource(9)
        keygen = hm.Context(p, source=src)
        keygen.generate_secret_key()
        keygen.generate_public_key()
        sk_b = keygen.get_secret_key().to_bytes()
        pk_b = keygen.get_public_key().to_bytes()

        cts = []
        for _ in range(2):
            c = hm.Context(p, encrypt_seed=42)
            c.set_secret_key(hm.SecretKey.from_bytes(sk_b))
            c.set_public_key(hm.PublicKey.from_bytes(pk_b))
            cts.append(c.encrypt(251, hm.U8))
        assert np.array_equal(np.asarray(cts[0].limbs), np.asarray(cts[1].limbs))

    def test_source_seam_routes_encryption_through_host_stream(self):
        p = hm.Parameters(64, 32, 8, 32)
        c1 = hm.Context(p, source=hm.ThreefrySource(5))
        c1.generate_secret_key()
        c1.generate_public_key()
        c2 = hm.Context(p, source=hm.ThreefrySource(5))
        c2.generate_secret_key()
        c2.generate_public_key()
        # identical source -> identical keys AND identical ciphertext bytes
        a, b = c1.encrypt(99, hm.U8), c2.encrypt(99, hm.U8)
        assert np.array_equal(np.asarray(a.limbs), np.asarray(b.limbs))


class TestZeroizeDeviceCaches:
    def test_zeroize_scrubs_device_buffers_and_caches(self):
        ctx = make_ctx()
        ctx.generate_secret_key()
        ctx.generate_public_key()
        sk = ctx.get_secret_key()
        c = ctx.encrypt(7, hm.U8)
        assert int(ctx.decrypt(c)) == 7  # populates the mask cache
        w = sk.decrypt_mask(c.num_limbs)
        rows = sk.reduction_rows(c.num_limbs)
        limbs = sk.limbs
        host = sk._host
        sk.zeroize()
        assert (host == 0).all()  # host staging buffer overwritten
        for arr in (w, rows, limbs):  # device buffers zero-written + freed
            assert arr.is_deleted()
        assert not sk._mask_cache and not sk._rows_cache
        with pytest.raises(hm.SecretKeyUnsetError):
            sk.decrypt_mask(c.num_limbs)


class TestOsEntropyKey:
    def test_fills_configured_impl_key_space(self):
        """os_entropy_key probes the configured PRNG impl's key-data shape
        instead of hardcoding threefry's 2 words (review finding)."""
        import jax
        import jax.numpy as jnp

        from homomorph_tpu.rng import os_entropy_key

        k1, k2 = os_entropy_key(), os_entropy_key()
        assert jax.random.key_data(k1).shape == jax.random.key_data(
            jax.random.key(0)
        ).shape
        assert not np.array_equal(
            np.asarray(jax.random.key_data(k1)), np.asarray(jax.random.key_data(k2))
        )
        # usable as a normal key
        assert jax.random.bits(k1, (4,), dtype=jnp.uint32).shape == (4,)


class TestConstructorGuards:
    def test_source_plus_encrypt_seed_rejected(self):
        with pytest.raises(ValueError, match="mutually exclusive"):
            hm.Context(
                hm.Parameters(64, 32, 8, 32),
                source=hm.ThreefrySource(1),
                encrypt_seed=2,
            )

    def test_zeroized_key_compares_unequal_not_crash(self):
        sk = hm.SecretKey.from_bytes(bytes([5, 14, 8]))
        sk2 = hm.SecretKey.from_bytes(bytes([5, 14, 8]))
        assert sk == sk2
        sk.zeroize()
        assert sk != sk2 and sk2 != sk and sk != sk


class TestContextZeroize:
    def test_zeroize_scrubs_and_clears(self):
        import homomorph_tpu as hm

        ctx = hm.Context(hm.Parameters(64, 16, 1, 16), source=hm.ThreefrySource(9))
        ctx.generate_secret_key()
        ctx.generate_public_key()
        sk = ctx.get_secret_key()
        ctx.zeroize()
        assert ctx.get_secret_key() is None and ctx.get_public_key() is None
        with pytest.raises(hm.SecretKeyUnsetError):
            sk.to_bytes()  # the key object itself is poisoned
        # context is reusable after fresh keygen
        ctx.generate_secret_key()
        ctx.generate_public_key()
        c = ctx.encrypt(5, hm.U8)
        assert int(ctx.decrypt(c)) == 5
