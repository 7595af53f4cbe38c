"""Checked-in byte-level interop fixtures (VERDICT r1 item 6).

``tests/fixtures/interop_v1.json`` records, for several parameter sets: a
full randomness stream, the expected secret/public key bytes, and expected
ciphertext polynomial bytes.  PROVENANCE: generated once by
``tests/fixtures/generate_interop.py`` from the independent big-int oracle
(tests/oracle.py) because cargo/rustc are unavailable in this environment;
the oracle's arithmetic is pinned to the Rust crate's hand-computed inline
vectors (src/polynomial.rs:522-591, ported in test_poly_golden.py) and the
byte formats follow src/polynomial.rs:98-122 / src/context.rs:153-155,
239-245 exactly.  If the real crate ever disagrees with these bytes, the
fixture file - not the tests - is what must change.

The tests prove: keys serialized by "the other implementation" load through
``SecretKey.from_bytes`` / ``PublicKey.from_bytes``; regenerating from the
recorded stream reproduces the fixture bytes exactly; fixture ciphertexts
decrypt under the fixture key; and our own encryption replayed on the same
stream reproduces the fixture ciphertext bytes.
"""

import json
import os

import jax
import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu.gf2 import poly as gf2

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "interop_v1.json")

with open(FIXTURE) as f:
    CASES = json.load(f)["cases"]

IDS = ["d{d}dp{dp}delta{delta}tau{tau}".format(**c["params"]) for c in CASES]


def words64_trim(data: bytes, degree: int) -> bytes:
    """Reference to_bytes emits deg//64 + 1 LE 64-bit words."""
    return data[: (degree // 64 + 1) * 8]


@pytest.fixture(scope="module", params=range(len(CASES)), ids=IDS)
def case(request):
    return CASES[request.param]


class TestKeyByteInterop:
    def test_keygen_reproduces_fixture_key_bytes(self, case):
        p = case["params"]
        ctx = hm.Context(
            hm.Parameters(p["d"], p["dp"], p["delta"], p["tau"]),
            source=hm.RecordedSource(bytes.fromhex(case["stream_hex"])),
        )
        ctx.generate_secret_key()
        ctx.generate_public_key()
        # sk bytes: ours are 32-bit-word multiples; the fixture's 64-bit -
        # identical after padding to the longer (LE format is word-size
        # agnostic, src/polynomial.rs:98-122)
        sk_bytes = ctx.get_secret_key().to_bytes()
        want_sk = bytes.fromhex(case["secret_key_hex"])
        n = max(len(sk_bytes), len(want_sk))
        assert sk_bytes.ljust(n, b"\0") == want_sk.ljust(n, b"\0")
        for got, want_hex in zip(ctx.get_public_key().to_bytes(),
                                 case["public_key_hex"]):
            want = bytes.fromhex(want_hex)
            n = max(len(got), len(want))
            assert got.ljust(n, b"\0") == want.ljust(n, b"\0")

    def test_fixture_keys_load_and_decrypt_fixture_ciphertexts(self, case):
        p = case["params"]
        sk = hm.SecretKey.from_bytes(bytes.fromhex(case["secret_key_hex"]))
        pk = hm.PublicKey.from_bytes(
            [bytes.fromhex(h) for h in case["public_key_hex"]]
        )
        assert sk.degree == p["d"]
        assert pk.tau == p["tau"]
        for pt_hex, ct_hexes in zip(case["plaintexts_hex"],
                                    case["ciphertexts_hex"]):
            rows = [gf2.limbs_from_bytes(bytes.fromhex(h)) for h in ct_hexes]
            L = max(r.size for r in rows)
            limbs = np.zeros((len(rows), L), dtype=np.uint32)
            for i, r in enumerate(rows):
                limbs[i, : r.size] = r
            desc = hm.BytesDescriptor(len(rows) // 8)
            c = hm.Ciphered.new_from_raw(
                jax.numpy.asarray(limbs), desc, bound=p["d"] + p["dp"]
            )
            assert c.decipher(sk) == bytes.fromhex(pt_hex)

    def test_our_encryption_reproduces_fixture_ciphertext_bytes(self, case):
        p = case["params"]
        ctx = hm.Context(
            hm.Parameters(p["d"], p["dp"], p["delta"], p["tau"]),
            source=hm.RecordedSource(bytes.fromhex(case["stream_hex"])),
        )
        ctx.generate_secret_key()
        ctx.generate_public_key()
        for pt_hex, ct_hexes in zip(case["plaintexts_hex"],
                                    case["ciphertexts_hex"]):
            pt = bytes.fromhex(pt_hex)
            c = ctx.encrypt(pt, hm.BytesDescriptor(len(pt)))
            limbs = np.asarray(jax.device_get(c.limbs), dtype=np.uint32)
            for i, want_hex in enumerate(ct_hexes):
                got = gf2.limbs_to_bytes(limbs[i])
                want = bytes.fromhex(want_hex)
                n = max(len(got), len(want))
                assert got.ljust(n, b"\0") == want.ljust(n, b"\0"), (
                    f"bit lane {i} of plaintext {pt_hex}"
                )
