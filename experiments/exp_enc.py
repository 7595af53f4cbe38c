"""Encrypt-path speed-of-light experiments (run on the real TPU).

Hypothesis (VERDICT r1 item 2): the XLA encrypt pipeline is HBM-bound on
the [B, D] counts intermediate (bf16 write + read ~ 2x 1.2 GB at B=2^21),
not MXU-bound (~0.9 ms of matmul at bf16 peak).  Variants:

  xla        - current default (unpack -> matmul -> parity_pack matmul)
  pallas_v2  - existing in-kernel-unpack kernel (baseline for Mosaic)
  pallas_v3  - NEW: pre-unpacked sel input; counts + parity + pack fused
               in VMEM (one kernel, two MXU dots, no counts round-trip)
  pallas_v3w - v3 but reading selw and unpacking in-kernel (repeat trick)
  int8       - XLA with int8 sel storage (halved sel traffic)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root


import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

import homomorph_tpu as hm
from homomorph_tpu.gf2 import poly as gf2
from homomorph_tpu.gf2.encrypt_kernel import _encrypt_fused, encrypt_bits_fused

U32 = jnp.uint32


def throughput(fn, n=12, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def pack_weights_b4(D: int) -> np.ndarray:
    """[D, 4*Lp] f32: byte-plane split of the bit->limb pack weights.

    Plane p holds 2^(k - 8p) for k in [8p, 8p+8): every partial sum is an
    integer <= 255, EXACT even under bf16 accumulation (Mosaic ignores
    preferred_element_type=f32 for bf16 MXU dots - measured: a 16-bit
    split loses bits)."""
    padded = -(-D // 32) * 32
    Lp = padded // 32
    col = np.arange(D)[:, None]
    limb = np.arange(Lp)[None, :]
    k = col - limb * 32
    planes = []
    for p in range(4):
        lo, hi = 8 * p, 8 * p + 8
        # clip BEFORE shifting: numpy evaluates 1 << k eagerly for every
        # entry, and k reaches D-1 (>63) - shift overflow poisons the plane
        w = np.where((k >= lo) & (k < hi), 1 << np.clip(k - lo, 0, 7), 0)
        planes.append(w)
    return np.concatenate(planes, axis=1).astype(np.float32)


def make_pallas_v3(pk_bits, packw, L, TB=512, in_words=False, tau=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = pk_bits.shape[1]
    W = None if not in_words else -(-tau // 32)

    def kernel(sel_ref, pk_ref, pw_ref, plain_ref, out_ref):
        if in_words:
            rep = pltpu.repeat(sel_ref[:], 32, axis=1)  # [TB, 32W]
            shifts = jax.lax.broadcasted_iota(U32, (1, 32 * W), 1) // U32(W)
            bits = (rep >> shifts) & 1
            sel = bits.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        else:
            sel = sel_ref[:].astype(jnp.bfloat16)
        counts = jnp.dot(sel, pk_ref[:], preferred_element_type=jnp.float32)
        cbits = (counts.astype(jnp.int32) & 1).astype(jnp.bfloat16)
        planes = jnp.dot(
            cbits, pw_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        Lp = pw_ref.shape[1] // 4
        # combine byte planes with MULTIPLIES, not shifts: Mosaic
        # miscompiles shift-by-constant on lane-sliced vectors (verified:
        # slice+cast+shift16 wrong, slice+cast+mul 2^16 correct); u32
        # multiply by a power of two is exact mod 2^32.
        limbs = (
            planes[:, :Lp].astype(U32)
            | (planes[:, Lp : 2 * Lp].astype(U32) * U32(1 << 8))
            | (planes[:, 2 * Lp : 3 * Lp].astype(U32) * U32(1 << 16))
            | (planes[:, 3 * Lp :].astype(U32) * U32(1 << 24))
        )
        flip = jnp.concatenate(
            [plain_ref[:] & 1, jnp.zeros((limbs.shape[0], Lp - 1), U32)], axis=1
        )
        out_ref[:] = (limbs ^ flip)[:, :L]

    @jax.jit
    def run(sel, plain):
        B = sel.shape[0]
        grid = (B // TB,)
        K = sel.shape[1]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(pk_bits.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(packw.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L), U32),
        )(sel, pk_bits, packw, plain)

    return run


def main():
    params = hm.Parameters(128, 128, 64, 128)
    ctx = hm.Context(params, source=hm.ThreefrySource(0))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk = ctx.get_public_key()
    pk_bits = jax.device_put(pk.bit_planes())
    L = gf2.limbs_for(params.pk_degree)
    tau = params.tau
    B = 1 << 21
    W = -(-tau // 32)
    D = pk_bits.shape[1]
    plain = jnp.zeros((B,), dtype=U32)
    plain2d = jnp.zeros((B, 1), dtype=U32)
    key = jax.random.key(1)

    packw = jnp.asarray(pack_weights_b4(D), dtype=jnp.bfloat16)

    results = {}

    # current default XLA pipeline (rng + unpack + 2 matmuls)
    @jax.jit
    def xla_step(k):
        sw = jax.random.bits(k, (B, W), dtype=U32)
        return encrypt_bits_fused(sw, pk_bits, plain, L)

    results["xla(default)"] = throughput(lambda: xla_step(key))

    # pallas v2 in-kernel unpack (existing)
    @jax.jit
    def v2_step(k):
        sw = jax.random.bits(k, (B, W), dtype=U32)
        return _encrypt_fused(sw, pk_bits, plain2d, tau, L)

    try:
        results["pallas_v2"] = throughput(lambda: v2_step(key))
    except Exception as e:
        results["pallas_v2"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"

    # pallas v3: pre-unpacked int8 sel, fused two-dot kernel
    for TB in (256, 512, 1024):
        run3 = make_pallas_v3(pk_bits, packw, L, TB=TB)

        @jax.jit
        def v3_step(k, run3=run3):
            sw = jax.random.bits(k, (B, W), dtype=U32)
            s = gf2.unpack_bits(sw, tau, dtype=jnp.int8)
            return run3(s, plain2d)

        try:
            got = np.asarray(v3_step(key))
            want = np.asarray(xla_step(key))
            ok = (got == want).all()
            results[f"pallas_v3 TB={TB}"] = (
                throughput(lambda: v3_step(key)) if ok else "MISMATCH"
            )
        except Exception as e:
            results[f"pallas_v3 TB={TB}"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"

    # pallas v3w: selw input, in-kernel unpack, fused dots (needs permuted pk)
    c = jnp.arange(32 * W)
    idx = (c % W) * 32 + c // W
    valid = idx < tau
    pk_perm = jnp.where(
        valid[:, None],
        jnp.take(pk_bits, jnp.minimum(idx, tau - 1), axis=0),
        jnp.zeros((1, D), pk_bits.dtype),
    )
    for TB in (512, 1024):
        run3w = make_pallas_v3(pk_perm, packw, L, TB=TB, in_words=True, tau=tau)

        @jax.jit
        def v3w_step(k, run3w=run3w):
            sw = jax.random.bits(k, (B, W), dtype=U32)
            return run3w(sw, plain2d)

        try:
            got = np.asarray(v3w_step(key))
            want = np.asarray(xla_step(key))
            ok = (got == want).all()
            results[f"pallas_v3w TB={TB}"] = (
                throughput(lambda: v3w_step(key)) if ok else "MISMATCH"
            )
        except Exception as e:
            results[f"pallas_v3w TB={TB}"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"

    # XLA with int8 sel storage
    @jax.jit
    def int8_step(k):
        sw = jax.random.bits(k, (B, W), dtype=U32)
        s = gf2.unpack_bits(sw, tau, dtype=jnp.int8)
        counts = jnp.matmul(
            s.astype(jnp.bfloat16), pk_bits, preferred_element_type=jnp.bfloat16
        )
        limbs = gf2.parity_pack(counts, L)
        return limbs

    results["xla int8-sel"] = throughput(lambda: int8_step(key))

    print(f"\nB = {B} bits, tau={tau}, D={D}, L={L}")
    for name, v in results.items():
        if isinstance(v, float):
            print(f"{name:20s}: {v*1e3:7.2f} ms  -> {B/v/1e6:8.1f} M bit-enc/s")
        else:
            print(f"{name:20s}: {v}")


if __name__ == "__main__":
    main()
