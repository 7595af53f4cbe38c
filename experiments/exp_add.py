"""Profiling experiments: adder carry chain + scaled-config encrypt SOL.

Round-3 measurements behind PERF.md's adder and scaled-config sections
(VERDICT r2 items 2 and 3).  Run on the real chip:

    python exp_add.py [add|scaled|both]

Prints a per-op device-time breakdown of one batched u32 homomorphic add
(the carry chain's 31 sequential clmuls + XLA glue) and device-busy
encrypt/decrypt rates for the d=dp=1024, tau=256 BASELINE config with the
HBM traffic model next to them.
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import sys


def _profile(fn, reps=2):
    """(total_jit_us_per_rep, {op_name: us_per_rep}) via the shared trace
    parser (homomorph_tpu.utils.profiling.device_busy)."""
    from homomorph_tpu.utils.profiling import device_busy

    secs, ops = device_busy(fn, reps=reps)
    return (secs or 0.0) * 1e6, {k: v for k, v in ops.items()}


def profile_add():
    import jax
    import jax.numpy as jnp

    import homomorph_tpu as hm
    from homomorph_tpu.gf2 import poly as gf2
    from homomorph_tpu.models import circuits
    from homomorph_tpu.utils import profiling

    hm.enable_compilation_cache()
    params = hm.Parameters(128, 128, 64, 128)
    ctx = hm.Context(params, encrypt_seed=1)
    ctx.generate_secret_key()
    ctx.generate_public_key()
    n_add = 2048
    vals = list(range(n_add))
    ca = ctx.encrypt(vals, hm.U32, batch=True)
    cb = ctx.encrypt(vals[::-1], hm.U32, batch=True)

    @jax.jit
    def add_step(a_limbs, b_limbs):
        a = hm.Ciphered(a_limbs, params.pk_degree, hm.U32)
        b = hm.Ciphered(b_limbs, params.pk_degree, hm.U32)
        return circuits.add(a, b).limbs

    jit_us, ops = _profile(lambda: add_step(ca.limbs, cb.limbs))
    print(f"\n== u32 add, B={n_add}, headline config ==")
    print(f"device-busy total: {jit_us/1e3:.2f} ms -> {n_add/(jit_us/1e6):,.0f} adds/s")
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:18]
    tot = sum(ops.values())
    for name, us in top:
        print(f"  {us/1e3:8.3f} ms  {100*us/max(tot,1e-9):5.1f}%  {name[:90]}")
    print(f"  (sum of device ops: {tot/1e3:.2f} ms)")

    # SOL: per-step clmul cost of the ripple chain
    B0 = params.pk_degree
    xb, gb = B0, 2 * B0
    mb = xb + gb
    Lm = gf2.bucket(gf2.limbs_for(mb))
    c_bound, sol = 0, 0.0
    for i in range(31):
        c_bound = max(gb, mb + c_bound)
        Lc = gf2.bucket(gf2.limbs_for(c_bound))
        sol += profiling.clmul_sol(n_add, max(Lc, Lm), min(Lc, Lm))
    # plus the up-front lane-parallel x/g/m products
    sol += profiling.clmul_sol(n_add * 32, gf2.limbs_for(B0), gf2.limbs_for(B0))
    sol += profiling.clmul_sol(n_add * 32, gf2.limbs_for(xb), gf2.limbs_for(gb))
    print(f"  VPU-compute SOL for the clmul chain: {sol*1e3:.2f} ms "
          f"({n_add/sol:,.0f} adds/s)")


def profile_scaled():
    import jax
    import jax.numpy as jnp

    import homomorph_tpu as hm
    from homomorph_tpu.gf2 import poly as gf2
    from homomorph_tpu.gf2.encrypt_kernel import encrypt_bits_fused
    from homomorph_tpu.utils import profiling

    hm.enable_compilation_cache()
    sp = hm.Parameters(1024, 1024, 64, 256)
    sctx = hm.Context(sp, encrypt_seed=2)
    sctx.generate_secret_key()
    sctx.generate_public_key()
    spk, ssk = sctx.get_public_key(), sctx.get_secret_key()
    spk_bits = jax.device_put(spk.bit_planes())
    sL = gf2.limbs_for(sp.pk_degree)
    sW = -(-sp.tau // 32)
    lB = 1 << 20
    lplain = jnp.zeros((lB,), dtype=jnp.uint32)

    @jax.jit
    def senc(key):
        selw = jax.random.bits(key, (lB, sW), dtype=jnp.uint32)
        return encrypt_bits_fused(selw, spk_bits, lplain, sL)

    key = jax.random.key(0)
    jit_us, ops = _profile(lambda: senc(key))
    print(f"\n== scaled encrypt d=dp=1024 tau=256, B=2^20 ==")
    print(f"device-busy: {jit_us/1e3:.2f} ms -> {lB/(jit_us/1e6):,.0f} bits/s")
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:12]
    tot = sum(ops.values())
    for name, us in top:
        print(f"  {us/1e3:8.3f} ms  {100*us/max(tot,1e-9):5.1f}%  {name[:90]}")

    # traffic model (PERF.md-style): per bit, sel bf16 write+read (2*tau*2B),
    # counts bf16 write+read (2*D*2B), selw+limbs u32
    D = gf2.bit_capacity(sL)
    per_bit = 2 * sp.tau * 2 + 2 * D * 2 + (sW + sL) * 4
    hbm = profiling.chip_peaks()["hbm_bw"]
    sol_ms = lB * per_bit / hbm * 1e3
    print(f"  traffic model: {per_bit} B/bit -> {sol_ms:.2f} ms at {hbm/1e9:.0f} GB/s "
          f"({lB/(sol_ms/1e3):,.0f} bits/s SOL)")
    # MXU model: counts matmul flops = 2*B*tau*D_padded
    Dp = -(-D // 128) * 128
    mxu = profiling.chip_peaks()["mxu_flops"]
    print(f"  MXU model: counts {2*lB*sp.tau*Dp/1e12:.2f} TFLOP "
          f"-> {2*lB*sp.tau*Dp/mxu*1e3:.2f} ms at peak; "
          f"pack {2*lB*D*(2*sL)/1e12:.2f} TFLOP")

    @jax.jit
    def sdec(c):
        return gf2.decipher_bits(c, ssk.decrypt_mask(sL))

    ct = senc(key)
    jit_us, ops = _profile(lambda: sdec(ct))
    print(f"scaled decrypt device-busy: {jit_us/1e3:.2f} ms -> "
          f"{lB/(jit_us/1e6):,.0f} bits/s "
          f"(read SOL: {lB*sL*4/hbm*1e3:.2f} ms)")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("add", "both"):
        profile_add()
    if what in ("scaled", "both"):
        profile_scaled()
