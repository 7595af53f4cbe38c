"""Bit-exact parity against the reference algorithm.

Replays a shared recorded randomness stream through the framework and
through an independently-written big-int oracle of the reference algorithm
(tests/oracle.py), asserting identical secret keys, public keys, and
ciphertext polynomials - the cross-implementation bit-exactness contract
(SURVEY §4: deterministic RNG injection seam)."""

import jax
import numpy as np
import pytest

import homomorph_tpu as hm
from oracle import OracleContext, OracleStream, rem_int


def limbs_to_int(limbs: np.ndarray) -> int:
    return int.from_bytes(np.asarray(limbs, dtype=np.uint32).tobytes(), "little")


@pytest.mark.parametrize(
    "d,dp,delta,tau",
    [(64, 32, 8, 32), (37, 13, 5, 11), (128, 128, 64, 128)],
)
def test_bit_exact_pipeline(d, dp, delta, tau, rng):
    stream = rng.integers(0, 256, size=2_000_000, dtype=np.uint8).tobytes()

    oracle = OracleContext(d, dp, delta, tau, OracleStream(stream))
    oracle.keygen()
    plain = 0b1100_1010
    oracle_bits = oracle.encrypt_bytes(bytes([plain]))

    ctx = hm.Context(
        hm.Parameters(d, dp, delta, tau), source=hm.RecordedSource(stream)
    )
    ctx.generate_secret_key()
    ctx.generate_public_key()

    assert limbs_to_int(np.frombuffer(ctx.get_secret_key().to_bytes(), np.uint8).view(np.uint32)) == oracle.sk or \
        int.from_bytes(ctx.get_secret_key().to_bytes(), "little") == oracle.sk
    pk_ints = [int.from_bytes(b, "little") for b in ctx.get_public_key().to_bytes()]
    assert pk_ints == oracle.pk

    c = ctx.encrypt(plain, hm.U8)
    limbs = np.asarray(jax.device_get(c.limbs))
    got = [limbs_to_int(limbs[i]) for i in range(8)]
    assert got == oracle_bits

    # both decrypt to the plaintext
    assert oracle.decrypt_bytes(oracle_bits) == bytes([plain])
    assert ctx.decrypt(c) == plain


def test_decrypt_matches_oracle_on_degree_grown_ciphertexts(rng):
    """After homomorphic ops the ciphertext degree far exceeds d+dp; the
    linear-map decrypt must agree with big-int long division."""
    from homomorph_tpu.models import HomomorphicAddition

    stream = rng.integers(0, 256, size=3_000_000, dtype=np.uint8).tobytes()
    d, dp, delta, tau = 64, 16, 1, 16
    ctx = hm.Context(hm.Parameters(d, dp, delta, tau), source=hm.RecordedSource(stream))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    sk_int = int.from_bytes(ctx.get_secret_key().to_bytes(), "little")

    a, b = ctx.encrypt(200, hm.U8), ctx.encrypt(100, hm.U8)
    s = ctx.apply2(HomomorphicAddition, a, b)
    limbs = np.asarray(jax.device_get(s.limbs))
    want_bits = []
    for i in range(8):
        want_bits.append(rem_int(limbs_to_int(limbs[i]), sk_int) & 1)
    got = list(s.decipher_bits(ctx.get_secret_key()))
    assert got == want_bits
    assert ctx.decrypt(s) == (200 + 100) % 256


def test_recorded_source_exhaustion():
    src = hm.RecordedSource(b"\x00" * 8)
    ctx = hm.Context(hm.Parameters(64, 32, 8, 32), source=src)
    with pytest.raises(hm.RandomnessError):
        ctx.generate_secret_key()
