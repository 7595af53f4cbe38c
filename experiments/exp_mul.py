"""Profiling experiment: carry-save tree multiplier vs the reference
column accumulation, on the real chip.

Round-3 measurement behind PERF.md's multiplier section.  Run on TPU:

    python exp_mul.py [u8|u16|both]

For each width: asserts tree and reference products decrypt identically
(and match the plaintext product), then reports wall and device-busy
times for both circuits at the reference's u8 bench config (d=128,
dp=128, delta=1, tau=128 - benches/u8.rs:9 uses d=128, delta=1).
u16 runs the tree only (the reference circuit's noise units put its
intermediate ciphertext degrees ~19x higher - measured here as time).
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
    for _ in range(steps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def _device(fn, reps=2):
    from homomorph_tpu.utils.profiling import device_busy

    secs, _ = device_busy(fn, reps=reps)
    return secs


def run(width: str):
    import jax

    import homomorph_tpu as hm
    from homomorph_tpu.models import circuits

    hm.enable_compilation_cache()
    B = 1024
    mp = hm.Parameters(128, 128, 1, 128)
    ctx = hm.Context(mp, source=hm.ThreefrySource(2))  # S(0)=0 seed: the
    # bench config is beyond both circuits' envelopes (NOISE.md), so
    # correct decryption needs an S(0)=0 key - verified below.
    ctx.generate_secret_key()
    ctx.generate_public_key()
    import numpy as np

    assert int(np.asarray(ctx.get_secret_key().limbs)[0] & 1) == 0

    desc = {"u8": hm.U8, "u16": hm.U16}[width]
    mask = (1 << desc.bits) - 1
    rng = np.random.default_rng(3)
    xs = [int(v) for v in rng.integers(0, mask + 1, size=B)]
    ys = [int(v) for v in rng.integers(0, mask + 1, size=B)]
    a = ctx.encrypt(xs, desc, batch=True)
    b = ctx.encrypt(ys, desc, batch=True)
    want = [(x * y) & mask for x, y in zip(xs, ys)]

    @jax.jit
    def tree_step(al, bl):
        return circuits.mul_unsigned(
            hm.Ciphered(al, mp.pk_degree, desc), hm.Ciphered(bl, mp.pk_degree, desc)
        ).limbs

    @jax.jit
    def ref_step(al, bl):
        return circuits.mul_unsigned_ref(
            hm.Ciphered(al, mp.pk_degree, desc), hm.Ciphered(bl, mp.pk_degree, desc)
        ).limbs

    print(f"\n== {width} mul, B={B}, (128,128,1,128), S(0)=0 key ==")
    got = [int(v) for v in ctx.decrypt(circuits.mul_unsigned(a, b))]
    assert got == want, "tree product decrypts wrong"
    print("tree product decrypts correctly")

    t = _wall(lambda: tree_step(a.limbs, b.limbs))
    d = _device(lambda: tree_step(a.limbs, b.limbs))
    print(f"tree: wall {t*1e3:8.2f} ms  {B/t:10,.1f}/s | device "
          f"{(d or 0)*1e3:8.2f} ms  {B/d if d else 0:10,.1f}/s")

    if width == "u8":
        gr = [int(v) for v in ctx.decrypt(circuits.mul_unsigned_ref(a, b))]
        assert gr == want, "reference product decrypts wrong"
        print("reference product decrypts correctly (same plaintexts)")
        t2 = _wall(lambda: ref_step(a.limbs, b.limbs))
        d2 = _device(lambda: ref_step(a.limbs, b.limbs))
        print(f"ref : wall {t2*1e3:8.2f} ms  {B/t2:10,.1f}/s | device "
              f"{(d2 or 0)*1e3:8.2f} ms  {B/d2 if d2 else 0:10,.1f}/s")
        if d and d2:
            print(f"tree speedup: {t2/t:.2f}x wall, {d2/d:.2f}x device-busy")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "u8"
    for w in (["u8", "u16"] if which == "both" else [which]):
        run(w)
