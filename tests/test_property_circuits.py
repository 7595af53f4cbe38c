"""Property test: random circuit compositions match plaintext arithmetic.

Beyond the reference's per-op truth tables (uint.rs/int.rs tests), this
composes RANDOM sequences of homomorphic ops and checks the decryption
against a plaintext model - the composition property the examples rely on
(any boolean function of k fresh input bits has degree <= k, so noise
degree <= k*(delta+1); at (d=256, delta=1) any circuit over <= 4 fresh u8
inputs stays decryptable with 8x margin).
"""

import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu.models import circuits


@pytest.fixture(scope="module")
def ctx():
    c = hm.Context(hm.Parameters(256, 16, 1, 16), source=hm.ThreefrySource(77))
    c.generate_secret_key()
    c.generate_public_key()
    return c


BINOPS = {
    "add": (circuits.add, lambda x, y: (x + y) & 0xFF),
    "sub": (circuits.sub, lambda x, y: (x - y) & 0xFF),
    "xor": (circuits.gate_xor, lambda x, y: x ^ y),
    "and": (circuits.gate_and, lambda x, y: x & y),
    "or": (circuits.gate_or, lambda x, y: x | y),
}
UNOPS = {
    "not": (circuits.gate_not, lambda x: x ^ 0xFF),
    "neg": (circuits.neg, lambda x: (-x) & 0xFF),
    "shl2": (lambda c: circuits.shl(c, 2), lambda x: (x << 2) & 0xFF),
    "shr3": (lambda c: circuits.shr(c, 3), lambda x: x >> 3),
    "rotl1": (lambda c: circuits.rotl(c, 1),
              lambda x: ((x << 1) | (x >> 7)) & 0xFF),
}
# min/max are boolean functions of their input bits too, so they obey the
# same fresh-bit degree argument as the arithmetic ops
BINOPS_CMP = {
    "min": (circuits.min_, np.minimum),
    "max": (circuits.max_, np.maximum),
}


@pytest.mark.parametrize("seed", range(6))
def test_random_composition(ctx, seed):
    rng = np.random.default_rng(1000 + seed)
    n_inputs = 3
    xs = [int(v) for v in rng.integers(0, 256, size=n_inputs)]
    # batch of 2 per ciphertext exercises the batched lanes too
    cs = [ctx.encrypt([x, x ^ 0x5A], hm.U8, batch=True) for x in xs]
    ps = [np.array([x, x ^ 0x5A]) for x in xs]

    for _ in range(4):
        if rng.random() < 0.25:
            name = rng.choice(list(UNOPS))
            f_c, f_p = UNOPS[name]
            i = int(rng.integers(len(cs)))
            cs[i] = f_c(cs[i])
            ps[i] = f_p(ps[i])
        else:
            table = BINOPS_CMP if rng.random() < 0.2 else BINOPS
            name = rng.choice(list(table))
            f_c, f_p = table[name]
            i, j = rng.choice(len(cs), size=2, replace=False)
            cs[i] = f_c(cs[i], cs[j])
            ps[i] = f_p(ps[i], ps[j])

    for c, p in zip(cs, ps):
        got = [int(v) for v in ctx.decrypt(c)]
        assert got == [int(v) for v in p], (seed, got, p)


def test_compare_select_composition(ctx):
    """min/max via lt + select composed with arithmetic."""
    a = ctx.encrypt([30, 200], hm.U8, batch=True)
    b = ctx.encrypt([50, 100], hm.U8, batch=True)
    lt = circuits.lt(a, b)  # Ciphered[Bool]
    mx = circuits.select(lt[0], b, a)   # cond ? b : a = max
    mn = circuits.select(lt[0], a, b)   # cond ? a : b = min
    s = circuits.add(mx, mn)            # max + min == a + b
    got = [int(v) for v in ctx.decrypt(s)]
    assert got == [(30 + 50) & 0xFF, (200 + 100) & 0xFF]
