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
