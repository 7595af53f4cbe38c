"""Benchmark harness - prints ONE JSON line with the headline metric.

Headline: bit-encryptions/s/chip at d=dp=tau=128 (the reference's
benches/u32.rs "cipher" config; README.md:71-73 baseline = 76us per u32 =
~4.2e5 bit-encryptions/s on one Ryzen 7800X3D core).

vs_baseline = ours / reference-per-core.

Extra metrics (decrypt latency, homomorphic add, decipher-after-add)
mirror the rest of benches/u32.rs and are reported in "extras".

Usage: python bench.py [--quick] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_BIT_ENC_PER_S = 32 / 76.0e-6  # README.md:71-73


def _time_steps(fn, n_steps: int, warmup: int = 3) -> float:
    """Median wall time per call of a device-bound closure."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes / few steps")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--batch-bits", type=int, default=0, help="override bit batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import homomorph_tpu as hm
    from homomorph_tpu.cipher import _encrypt_core, _random_selection
    from homomorph_tpu.gf2 import poly as gf2
    from homomorph_tpu.models import circuits

    dev = jax.devices()[0]
    log = (lambda *a: None) if args.json_only else (lambda *a: print(*a, file=sys.stderr))
    log(f"device: {dev}")

    params = hm.Parameters(128, 128, 64, 128)
    ctx = hm.Context(params, source=hm.ThreefrySource(0))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk, sk = ctx.get_public_key(), ctx.get_secret_key()
    pk_bits = jax.device_put(pk.bit_planes())
    L = gf2.limbs_for(params.pk_degree)
    tau = params.tau

    n_steps = 5 if args.quick else 20
    B = args.batch_bits or (1 << 14 if args.quick else 1 << 20)

    # ---- bit-encryption throughput (sel generation + parity matmul + pack)
    plain = jnp.zeros((B,), dtype=jnp.uint32)

    @jax.jit
    def enc_step(key):
        sel = _random_selection(key, (B,), tau)
        return _encrypt_core(sel, pk_bits, plain, L)

    key = jax.random.key(1)
    t = _time_steps(lambda: enc_step(key), n_steps)
    bit_enc_per_s = B / t
    log(f"encrypt: {B} bits in {t*1e3:.2f} ms -> {bit_enc_per_s:,.0f} bit-enc/s")

    ct = enc_step(key)

    # ---- decrypt throughput + latency ------------------------------------
    w = sk.decrypt_mask(L)

    @jax.jit
    def dec_step(c):
        return gf2.decipher_bits(c, w)

    t_dec = _time_steps(lambda: dec_step(ct), n_steps)
    dec_per_s = B / t_dec
    log(f"decrypt: {dec_per_s:,.0f} bit-dec/s (batch)")

    # p50 latency for a single u32 (32 bits) - the reference's latency metric
    ct32 = ct[:32]
    t_lat = _time_steps(lambda: dec_step(ct32), n_steps)
    log(f"decrypt u32 p50 latency: {t_lat*1e6:.1f} us (ref: 12.5 us)")

    # ---- homomorphic add u32 (batched) -----------------------------------
    n_add = 64 if args.quick else 2048
    ca = hm.Ciphered(ct[: n_add * 32].reshape(n_add, 32, L), params.pk_degree, hm.U32)
    cb = hm.Ciphered(ct[n_add * 32 : 2 * n_add * 32].reshape(n_add, 32, L),
                     params.pk_degree, hm.U32)

    @jax.jit
    def add_step(a_limbs, b_limbs):
        a = hm.Ciphered(a_limbs, params.pk_degree, hm.U32)
        b = hm.Ciphered(b_limbs, params.pk_degree, hm.U32)
        return circuits.add(a, b).limbs

    t_add = _time_steps(lambda: add_step(ca.limbs, cb.limbs), max(3, n_steps // 4), warmup=1)
    add_per_s = n_add / t_add
    log(f"hom. add u32: {add_per_s:,.1f} adds/s batched (ref single: {1/950e-6:,.1f}/s)")

    sum_limbs = add_step(ca.limbs, cb.limbs)

    # ---- decipher after add ----------------------------------------------
    w_big = sk.decrypt_mask(sum_limbs.shape[-1])

    @jax.jit
    def dec_big(c):
        return gf2.decipher_bits(c, w_big)

    t_dab = _time_steps(lambda: dec_big(sum_limbs), n_steps)
    dab_per_s = n_add / t_dab
    log(f"decipher-after-add u32: {dab_per_s:,.1f}/s batched (ref: {1/1.03e-3:,.1f}/s)")

    result = {
        "metric": "bit_encryptions_per_s_per_chip",
        "value": round(bit_enc_per_s, 1),
        "unit": "bits/s",
        "vs_baseline": round(bit_enc_per_s / REFERENCE_BIT_ENC_PER_S, 2),
        "extras": {
            "params": "d=128 dp=128 delta=64 tau=128",
            "batch_bits": B,
            "decrypt_bits_per_s": round(dec_per_s, 1),
            "decrypt_u32_p50_us": round(t_lat * 1e6, 2),
            "add_u32_per_s_batched": round(add_per_s, 2),
            "decipher_after_add_u32_per_s": round(dab_per_s, 2),
            "device": str(dev),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
