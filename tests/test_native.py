"""Cross-checks between the device kernels and the native C engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from homomorph_tpu import native
from homomorph_tpu.gf2 import poly as gf2

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_clmul_matches_device(rng):
    for _ in range(20):
        La, Lb = int(rng.integers(1, 8)), int(rng.integers(1, 8))
        a = rng.integers(0, 2**32, size=La, dtype=np.uint32)
        b = rng.integers(0, 2**32, size=Lb, dtype=np.uint32)
        dev = np.asarray(gf2.clmul(jnp.asarray(a), jnp.asarray(b)))
        nat = native.clmul(a, b)
        assert (dev == nat).all()


def test_rem_matches_device(rng):
    for _ in range(20):
        Lc = int(rng.integers(1, 6))
        c = rng.integers(0, 2**32, size=Lc, dtype=np.uint32)
        sdeg = int(rng.integers(1, 48))
        s_int = (1 << sdeg) | int(rng.integers(0, 1 << min(sdeg, 30)))
        s = np.frombuffer(s_int.to_bytes(8, "little"), dtype=np.uint32)[
            : sdeg // 32 + 1
        ].copy()
        dev = np.asarray(gf2.rem_iterative(jnp.asarray(c), jnp.asarray(s), sdeg))
        nat = native.rem(c, s, sdeg)
        assert int.from_bytes(np.asarray(dev).tobytes(), "little") == int.from_bytes(
            nat.tobytes(), "little"
        )


def test_decrypt_batch_matches_device(rng):
    sdeg = 40
    s_int = (1 << sdeg) | int(rng.integers(0, 1 << 30))
    s = np.frombuffer(s_int.to_bytes(8, "little"), dtype=np.uint32)[
        : sdeg // 32 + 1
    ].copy()
    L = 6
    w = np.asarray(gf2.decrypt_mask(jnp.asarray(s), sdeg, L))
    c = rng.integers(0, 2**32, size=(128, L), dtype=np.uint32)
    dev = np.asarray(gf2.decipher_bits(jnp.asarray(c), jnp.asarray(w)))
    nat = native.decrypt_batch(c, w)
    assert (dev.astype(np.uint8) == nat).all()


def test_encrypt_batch_matches_device(rng):
    tau, L, B = 24, 5, 64
    pk = rng.integers(0, 2**32, size=(tau, L), dtype=np.uint32)
    sel = rng.integers(0, 2, size=(B, tau)).astype(np.uint8)
    x = rng.integers(0, 2, size=B).astype(np.uint8)
    nat = native.encrypt_batch(pk, sel, x)

    from homomorph_tpu.cipher import _encrypt_core

    pk_bits = gf2.unpack_bits(jnp.asarray(pk), L * 32).astype(jnp.bfloat16)
    dev = np.asarray(
        _encrypt_core(jnp.asarray(sel), pk_bits, jnp.asarray(x.astype(np.uint32)), L)
    )
    assert (dev == nat).all()


def test_decrypt_mask_matches_device(rng):
    # the host-side mask (single-row-workspace recurrence) must be
    # bit-identical to the device scan - it is the round-5 path that
    # decrypts u32-product-scale ciphertexts without a 25M-step device scan
    for sdeg in (5, 40, 130):
        s_int = (1 << sdeg) | int(rng.integers(0, 1 << min(sdeg, 30)))
        nby = sdeg // 8 + 1
        nby += (-nby) % 4
        s = np.frombuffer(s_int.to_bytes(nby, "little"), dtype=np.uint32).copy()
        for L in (1, 7, 64):
            dev = np.asarray(gf2.decrypt_mask(jnp.asarray(s), sdeg, L))
            nat = native.decrypt_mask(s, sdeg, L)
            assert nat is not None
            assert (dev == nat).all(), (sdeg, L)


def test_secret_key_routes_large_classes_to_native(monkeypatch, rng):
    import homomorph_tpu as hm
    from homomorph_tpu.keys import SecretKey

    ctx = hm.Context(hm.Parameters(64, 16, 1, 16), source=hm.ThreefrySource(4))
    ctx.generate_secret_key()
    sk = ctx.get_secret_key()
    L = 24
    want = np.asarray(gf2.decrypt_mask(sk.limbs, sk.degree, L))
    monkeypatch.setattr(SecretKey, "NATIVE_MASK_MIN_LIMBS", 8)
    got = np.asarray(sk.decrypt_mask(L))
    assert (want == got).all()
