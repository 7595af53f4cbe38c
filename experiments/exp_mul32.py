"""Profiling experiment: u16/u32 homomorphic multiply on the real chip at
ALL-KEYS-SOUND parameters (checked API; d/delta >= the exact carry-save
tree bound - models/noise.py::mul_noise_degree).

The reference calls homomorphic multiplication "uncomfortably long" at u8
and cannot run u16+ at all (its column-accumulation bound is 19,348 at
u16 and 4.4e8 at u32 - beyond the u16 parameter field).  The carry-save
tree (models/csaplan.py) with the round-5 majority-form ripple brings
u16 to d/delta >= 417 and u32 to 2,385, inside the representable space.
This measures what those wide products actually cost on one v5e chip.
(Round 4's m-form bounds were 1,013 / 5,873; MUL32_r05.json's first
execution ran at d=5888 under that older envelope.)

Run on TPU:  python exp_mul32.py [u16|u32|both]
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import sys
import time


def _wall(fn, steps=4, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(steps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / steps


def _device(fn, reps=2):
    from homomorph_tpu.utils.profiling import device_busy

    secs, _ = device_busy(fn, reps=reps)
    return secs


CONFIGS = {
    # width: (d, B) - d chosen just above the exact tree bound at delta=1
    # (round 5: u16: 417, u32: 2,385); dp/tau kept at the headline 128.
    # u16 stays at the round-3/4 bench config d=1024 for like-for-like
    # BENCH comparability (417 would also be sound now).
    "u16": (1024, 512),
    # u32 at the round-5 sound bound: product 95,361 limbs/lane (the
    # round-4 envelope d=5888 gave 786,432); B=8 fits easily in HBM
    "u32": (2432, 8),
}


def run(width: str):
    import jax
    import numpy as np

    import homomorph_tpu as hm
    from homomorph_tpu.models import HomomorphicMultiplication, circuits

    hm.enable_compilation_cache()
    d, B = CONFIGS[width]
    mp = hm.Parameters(d, 128, 1, 128)
    ctx = hm.Context(mp, source=hm.ThreefrySource(11))
    ctx.generate_secret_key()
    ctx.generate_public_key()

    desc = {"u16": hm.U16, "u32": hm.U32}[width]
    mask = (1 << desc.bits) - 1
    rng = np.random.default_rng(7)
    xs = [int(v) for v in rng.integers(0, mask + 1, size=B)]
    ys = [int(v) for v in rng.integers(0, mask + 1, size=B)]
    a = ctx.encrypt(xs, desc, batch=True)
    b = ctx.encrypt(ys, desc, batch=True)
    want = [(x * y) & mask for x, y in zip(xs, ys)]

    print(f"\n== {width} mul, B={B}, (d={d},dp=128,delta=1,tau=128) "
          f"- CHECKED API bound, any key ==")
    # the checked API enforces the exact width-aware bound (raises below it)
    req = HomomorphicMultiplication.requirement_for(a, b)
    assert d // mp.delta >= req, (d, req)

    import os

    eager = os.environ.get("EXP_MUL_EAGER", "0") == "1"
    if eager:
        # eager mode: every gate dispatches its own (persistently cached)
        # kernel, so a killed run's compile work survives to the next one -
        # the one-big-jit program below only lands in the cache when its
        # full multi-hour compile completes.
        def mul_step(al, bl):
            return circuits.mul_unsigned(
                hm.Ciphered(al, mp.pk_degree, desc),
                hm.Ciphered(bl, mp.pk_degree, desc),
            ).limbs
    else:
        @jax.jit
        def mul_step(al, bl):
            return circuits.mul_unsigned(
                hm.Ciphered(al, mp.pk_degree, desc),
                hm.Ciphered(bl, mp.pk_degree, desc),
            ).limbs

    t0 = time.perf_counter()
    prod_limbs = mul_step(a.limbs, b.limbs)
    jax.block_until_ready(prod_limbs)
    prod = hm.Ciphered(prod_limbs, int(prod_limbs.shape[-1]) * 32 - 1, desc)
    got = [int(v) for v in ctx.decrypt(prod)]
    assert got == want, f"{width} product decrypts wrong"
    print(f"product decrypts correctly (first compile+eval "
          f"{time.perf_counter()-t0:.1f}s; result {prod_limbs.shape})")

    t = _wall(lambda: mul_step(a.limbs, b.limbs))
    dv = _device(lambda: mul_step(a.limbs, b.limbs))
    print(f"tree: wall {t*1e3:9.2f} ms  {B/t:9,.1f}/s | device "
          f"{(dv or 0)*1e3:9.2f} ms  {B/dv if dv else 0:9,.1f}/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for w in (["u16", "u32"] if which == "both" else [which]):
        run(w)
