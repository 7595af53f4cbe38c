"""Encrypted max: compare and select without decrypting.

Demonstrates the extension ops beyond the reference's set: the unsigned
borrow-chain comparison (``circuits.gt``) feeding the homomorphic mux
(``circuits.select``) - ``max(a, b)`` computed entirely on ciphertexts.
Pattern analogue of the reference's examples (examples/simple_struct.rs):
a tiny end-to-end pipeline ending in asserts.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/encrypted_max.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import homomorph_tpu as hm
from homomorph_tpu.models import circuits


def main() -> None:
    # gt's borrow chain shares the adder's requirement: d/delta >= 21
    ctx = hm.Context(hm.Parameters(d=64, dp=16, delta=1, tau=16))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    sk = ctx.get_secret_key()

    xs = [12, 200, 7, 99]
    ys = [40, 13, 7, 255]
    a = ctx.encrypt(xs, hm.U8, batch=True)
    b = ctx.encrypt(ys, hm.U8, batch=True)

    is_gt = circuits.gt(a, b)            # Ciphered[Bool]
    mx = circuits.select(is_gt[0], a, b)  # gt ? a : b

    got = [int(v) for v in mx.decipher(sk)]
    want = [max(x, y) for x, y in zip(xs, ys)]
    assert got == want, (got, want)
    print(f"max({xs}, {ys}) = {got}  [homomorphic]")


if __name__ == "__main__":
    main()
