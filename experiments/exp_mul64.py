"""u64 homomorphic multiplication at the ALL-KEYS-SOUND bound, on chip.

The reference cannot express u64 multiplication at any parameters (its
column circuit's bound is 3.9e17, src/impls/numbers/uint.rs:96 vs the
u16 parameter field); the carry-save tree with the round-5 majority
ripple needs d/delta >= 13,373 - representable (d is u16).  Round-5
feasibility arithmetic (NOISE.md §4b):

* product degree 90,287,744 = 2,821,493 limbs/lane -> 0.72 GB for the
  64-lane product at B=1 (round 4's m-form circuit: 4.48 GB);
* decrypt mask: ~90M-row native host recurrence (gf2_decrypt_mask),
  then the standard on-device popcount-parity decrypt.

Run on TPU:  EXP_MUL_EAGER=1 HOMOMORPH_TPU_EAGER_SYNC=1 \
             python experiments/exp_mul64.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import time


def run() -> None:
    import jax
    import numpy as np

    import homomorph_tpu as hm
    from homomorph_tpu.models import HomomorphicMultiplication, circuits

    hm.enable_compilation_cache()
    d = 13440  # >= exact tree bound 13,373 (models/noise.py), 128 | d
    mp = hm.Parameters(d, 128, 1, 128)
    ctx = hm.Context(mp, source=hm.ThreefrySource(11))
    t0 = time.perf_counter()
    ctx.generate_secret_key()
    ctx.generate_public_key()
    print(f"keygen (d={d}): {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(7)
    x = int(rng.integers(0, 1 << 64, dtype=np.uint64))
    y = int(rng.integers(0, 1 << 64, dtype=np.uint64))
    want = (x * y) & 0xFFFFFFFFFFFFFFFF
    a = ctx.encrypt(x, hm.U64)
    b = ctx.encrypt(y, hm.U64)
    req = HomomorphicMultiplication.requirement_for(a, b)
    assert d // mp.delta >= req, (d, req)
    print(f"checked gate OPEN: requirement {req} <= d/delta {d}", flush=True)

    t0 = time.perf_counter()
    prod = circuits.mul_unsigned(a, b)
    jax.block_until_ready(prod.limbs)
    t_mul = time.perf_counter() - t0
    print(f"tree executed: {t_mul:.1f}s, product {prod.limbs.shape} "
          f"({prod.limbs.size * 4 / 1e9:.2f} GB)", flush=True)

    t0 = time.perf_counter()
    got = int(ctx.decrypt(prod))
    t_dec = time.perf_counter() - t0
    assert got == want, f"u64 product wrong: {got:#x} != {want:#x}"
    print(f"u64 PRODUCT DECRYPTS CORRECTLY on-chip ({t_dec:.1f}s decrypt; "
          f"{x:#x} * {y:#x} = {got:#x})", flush=True)


if __name__ == "__main__":
    run()
