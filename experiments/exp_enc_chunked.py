"""Round-4 encrypt fusion experiment: attack the counts round-trip with
XLA-level restructuring (no Mosaic), per the round-3 verdict.

The headline encrypt pipeline materializes counts `bf16[B,288]` between the
two MXU matmuls (write+read = 2.4 of 3.5 GB/step at B=2^21 - PERF.md).
Verdict item 2 asks for the chunked-D variant (consume each counts block
while fusion-resident) and/or B-segmenting with `lax.map` so the live
intermediate shrinks to VMEM size.  This measures:

  baseline     - the shipped `_encrypt_core` pipeline
  chunkD-<bs>  - D split into limb-aligned blocks; each block's counts are
                 parity-packed immediately inside one jit
  mapB-<seg>   - `lax.map` over B segments (counts per segment is VMEM-size;
                 XLA memory-space assignment may promote it)
  vpu-pack     - replace the pack MATMUL with an elementwise*weights +
                 grouped-sum reduce, a legal dot-EPILOGUE fusion shape
                 (the round-2 "VPU pack" was a separate fusion reading
                 counts back from HBM; this probes whether XLA will output-
                 fuse the reduce into the counts dot and never write counts)
  mapB+vpu     - both

Each variant is checked bit-exact against baseline, then timed wall +
device-busy (profiler).  Run on TPU: python exp_enc_chunked.py
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import time

import jax
import jax.numpy as jnp
import numpy as np

import homomorph_tpu as hm
from homomorph_tpu.gf2 import poly as gf2
from homomorph_tpu.utils.profiling import device_busy

U32 = jnp.uint32


def throughput(fn, n=10, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def main():
    params = hm.Parameters(128, 128, 64, 128)
    ctx = hm.Context(params, source=hm.ThreefrySource(0))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk_bits = jax.device_put(ctx.get_public_key().bit_planes())
    L = gf2.limbs_for(params.pk_degree)
    tau = params.tau
    B = 1 << 21
    W = -(-tau // 32)
    D = pk_bits.shape[1]
    plain = jnp.zeros((B,), dtype=U32)
    key = jax.random.key(1)
    acc = jnp.bfloat16

    def sel_of(k):
        sw = jax.random.bits(k, (B, W), dtype=U32)
        return gf2.unpack_bits(sw, tau)

    # ---- baseline: shipped pipeline ------------------------------------
    @jax.jit
    def base_step(k):
        s = sel_of(k)
        counts = jnp.matmul(s.astype(acc), pk_bits, preferred_element_type=acc)
        limbs = gf2.parity_pack(counts, L)
        return gf2.xor_const_bit(limbs, plain)

    variants = {}

    # ---- chunked D -----------------------------------------------------
    def make_chunkD(block_limbs):
        bl = block_limbs * 32

        @jax.jit
        def step(k):
            s = sel_of(k).astype(acc)
            outs = []
            for lo in range(0, D, bl):
                hi = min(lo + bl, D)
                counts = jnp.matmul(
                    s, pk_bits[:, lo:hi], preferred_element_type=acc
                )
                outs.append(gf2.parity_pack(counts, (hi - lo) // 32))
            limbs = jnp.concatenate(outs, axis=-1)
            return gf2.xor_const_bit(gf2.fit_limbs(limbs, L), plain)

        return step

    for bls in (3, 4):  # 96- and 128-column blocks of the 288
        variants[f"chunkD-{bls * 32}"] = make_chunkD(bls)

    # ---- vpu pack (dot-epilogue candidate) -----------------------------
    # weights as a multiply (not shift): XLA-side, exact in int32
    w32 = jnp.asarray((1 << np.arange(32)).astype(np.int64) % (1 << 32),
                      dtype=U32)

    def vpu_pack(counts):
        parity = (counts.astype(jnp.int32) & 1).astype(U32)
        g = parity.reshape(*parity.shape[:-1], -1, 32)
        return (g * w32).sum(axis=-1, dtype=U32)

    @jax.jit
    def vpu_step(k):
        s = sel_of(k)
        counts = jnp.matmul(s.astype(acc), pk_bits, preferred_element_type=acc)
        limbs = vpu_pack(counts)
        return gf2.xor_const_bit(gf2.fit_limbs(limbs, L), plain)

    variants["vpu-pack"] = vpu_step

    # ---- lax.map over B segments ---------------------------------------
    def make_mapB(seg, pack):
        nseg = B // seg

        @jax.jit
        def step(k):
            sw = jax.random.bits(k, (nseg, seg, W), dtype=U32)

            def body(sw_seg):
                s = gf2.unpack_bits(sw_seg, tau)
                counts = jnp.matmul(
                    s.astype(acc), pk_bits, preferred_element_type=acc
                )
                if pack == "mxu":
                    return gf2.parity_pack(counts, L)
                return gf2.fit_limbs(vpu_pack(counts), L)

            limbs = jax.lax.map(body, sw)
            return gf2.xor_const_bit(limbs.reshape(B, L), plain)

        return step

    for seg in (1 << 13, 1 << 15, 1 << 17):
        variants[f"mapB-{seg}"] = make_mapB(seg, "mxu")
    variants["mapB+vpu-32768"] = make_mapB(1 << 15, "vpu")

    # ---- run ------------------------------------------------------------
    want = np.asarray(base_step(key))
    t = throughput(lambda: base_step(key))
    dv, _ = device_busy(lambda: base_step(key), reps=2)
    print(f"\nB={B}, D={D}, L={L}")
    print(f"{'baseline':18s}: wall {t * 1e3:7.2f} ms {B / t / 1e6:7.1f} M/s"
          f" | device {dv * 1e3:7.2f} ms {B / dv / 1e6:7.1f} M/s")

    for name, step in variants.items():
        try:
            got = np.asarray(step(key))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:18s}: FAIL {type(e).__name__}: {str(e)[:100]}")
            continue
        if (got != want).any():
            print(f"{name:18s}: MISMATCH")
            continue
        t = throughput(lambda: step(key))
        dv, _ = device_busy(lambda: step(key), reps=2)
        print(f"{name:18s}: wall {t * 1e3:7.2f} ms {B / t / 1e6:7.1f} M/s"
              f" | device {dv * 1e3:7.2f} ms {B / dv / 1e6:7.1f} M/s")


if __name__ == "__main__":
    main()
