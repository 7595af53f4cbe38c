"""Round-4: speed-of-light analysis of the carry-save tree multiplier.

The round-3 verdict flagged mul_u16 (1.42 s/step at B=512, BENCH_r03) as
the one hot path with no roofline: nothing said which CSA level or the
final heterogeneous ripple dominates, so 361 muls/s had no evidence of
being near any bound.  This experiment:

1. replays the u16 plan ANALYTICALLY, summing `clmul_sol` over every
   product the circuit executes (partial-product tensor, each compressor
   level's grouped clmuls, the final ripple's g/m/c chain) with the exact
   bucketed operand widths the circuit uses -> a per-stage compute bound;
2. measures each stage ON CHIP (device-busy via the profiler), threading
   the real bits state between separately-dispatched stages;
3. prints the per-stage table: measured vs bound vs fraction.

Run on TPU:  python exp_mul_roofline.py [u8|u16]
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import sys
import time


def run(width: str) -> None:
    import jax
    import numpy as np

    import homomorph_tpu as hm
    from homomorph_tpu.models import circuits, csaplan
    from homomorph_tpu.utils.profiling import chip_peaks, clmul_sol, device_busy

    hm.enable_compilation_cache()
    d, B = {"u8": (160, 512), "u16": (1024, 512)}[width]
    desc = {"u8": hm.U8, "u16": hm.U16}[width]
    n = desc.bits
    mp = hm.Parameters(d, 128, 1, 128)
    ctx = hm.Context(mp, source=hm.ThreefrySource(11))
    ctx.generate_secret_key()
    ctx.generate_public_key()

    rng = np.random.default_rng(7)
    mask = (1 << n) - 1
    xs = [int(v) for v in rng.integers(0, mask + 1, size=B)]
    ys = [int(v) for v in rng.integers(0, mask + 1, size=B)]
    a = ctx.encrypt(xs, desc, batch=True)
    b = ctx.encrypt(ys, desc, batch=True)

    plan = csaplan.csa_plan(n)

    # ---- stage runners (eager; each dispatch is a cached compiled kernel)
    def stage_pp(bits_in):
        a_, b_ = bits_in
        pp = circuits._pp_tensor(a_, b_)
        return circuits._pp_bits(pp, n)

    def make_level(k):
        def run_level(bits):
            bits = dict(bits)
            level = plan.levels[k]
            pairs = []
            for op in level:
                x, y = bits[op.x], bits[op.y]
                if op.z is None:
                    bits[op.sum] = x.xor(y)
                    if op.carry is not None:
                        pairs.append((x, y, op.carry))
                else:
                    xy = x.xor(y)
                    bits[op.sum] = xy.xor(bits[op.z])
                    if op.carry is not None:
                        pairs.append((x, y, ("p1", op.carry)))
                        pairs.append((xy, bits[op.z], ("p2", op.carry)))
            prods = circuits._batched_clmul_pairs(pairs)
            for op in level:
                if op.carry is None:
                    continue
                if op.z is None:
                    bits[op.carry] = circuits._fit_bit(prods[op.carry])
                else:
                    p1, p2 = prods[("p1", op.carry)], prods[("p2", op.carry)]
                    from homomorph_tpu.cipher import CipheredBit
                    from homomorph_tpu.gf2 import poly as gf2

                    carry = CipheredBit(
                        gf2.xor(p1.limbs, p2.limbs),
                        max(p1.bound, p2.bound),
                        noise=max(p1.noise, p2.noise),
                    )
                    bits[op.carry] = circuits._fit_bit(carry)
            return bits

        return run_level

    def stage_ripple(bits):
        A = [bits[c[0]] if len(c) > 0 else None for c in plan.final_cols]
        Bv = [bits[c[1]] if len(c) > 1 else None for c in plan.final_cols]
        return circuits._ripple_add_rows(A, Bv, a.batch_shape)

    def block(x):
        leaves = jax.tree_util.tree_leaves(
            {k: v.limbs for k, v in x.items()} if isinstance(x, dict)
            else [v.limbs for v in x]
        )
        jax.block_until_ready(leaves)
        return x

    # ---- SOL model per stage (the exact products the circuit launches)
    from homomorph_tpu.gf2 import poly as gf2

    def bit_limbs(bnd, bucketed=True):
        L = gf2.limbs_for(bnd)
        return gf2.bucket(L) if bucketed else L

    def group_sol(pairs_wb):
        """pairs_wb: list of (La_limbs, Lb_limbs); grouped like
        _batched_clmul_pairs (one stacked clmul per distinct (La, Lb))."""
        groups = {}
        for La, Lb in pairs_wb:
            groups.setdefault((La, Lb), 0)
            groups[(La, Lb)] += 1
        tot = 0.0
        for (La, Lb), cnt in groups.items():
            lo, hi = min(La, Lb), max(La, Lb)
            tot += clmul_sol(B * cnt, hi, lo)
        return tot

    # replay bounds exactly like the circuit
    fresh = mp.pk_degree
    sol = {}
    # pp tensor: ONE clmul broadcast over n*n lanes (exact width)
    sol["pp"] = clmul_sol(B * n * n, bit_limbs(fresh, False), bit_limbs(fresh, False))
    bound = {i * n + j: 2 * fresh for i in range(n) for j in range(n - i)}
    for k, level in enumerate(plan.levels):
        pairs_wb = []
        for op in level:
            if op.z is None:
                bx, by = bound[op.x], bound[op.y]
                bound[op.sum] = max(bx, by)
                if op.carry is not None:
                    pairs_wb.append((bit_limbs(bx), bit_limbs(by)))
                    bound[op.carry] = bx + by
            else:
                bx, by, bz = bound[op.x], bound[op.y], bound[op.z]
                bound[op.sum] = max(bx, by, bz)
                if op.carry is not None:
                    pairs_wb.append((bit_limbs(bx), bit_limbs(by)))
                    pairs_wb.append((bit_limbs(max(bx, by)), bit_limbs(bz)))
                    bound[op.carry] = sum(sorted((bx, by, bz))[-2:])
        sol[f"level{k}"] = group_sol(pairs_wb)
    # final ripple (round-5 majority x-form, circuits._ripple_add_rows):
    # g = a*b only for two-row columns; chain step is x*c with
    # x = a ^ b the sum lane itself (single-row columns skip g entirely)
    A = [bound[c[0]] if len(c) > 0 else None for c in plan.final_cols]
    Bb = [bound[c[1]] if len(c) > 1 else None for c in plan.final_cols]
    rip = []
    carry = None
    for i in range(n - 1):
        ga, gb = A[i], Bb[i]
        if ga is None and gb is not None:
            ga, gb = gb, ga
        x = ga if gb is None else max(ga, gb)  # None if column empty
        two_row = ga is not None and gb is not None
        if two_row:
            rip.append((bit_limbs(ga), bit_limbs(gb)))          # g = a*b
        if x is None:
            carry = None
            continue
        if carry is not None:
            rip.append((bit_limbs(x), bit_limbs(carry)))        # x*c
            t = x + carry
            carry = t if not two_row else max(ga + gb, t)
        else:
            carry = (ga + gb) if two_row else None
    sol["ripple"] = group_sol(rip)

    # ---- measured per stage -------------------------------------------
    print(f"\n== {width} mul roofline, B={B}, d={d} ==")
    t0 = time.perf_counter()
    states = [block(stage_pp((a, b)))]
    for k in range(len(plan.levels)):
        states.append(block(make_level(k)(states[-1])))
    out_lanes = stage_ripple(states[-1])
    jax.block_until_ready([v.limbs for v in out_lanes])
    print(f"(pipeline warm-up/compile {time.perf_counter() - t0:.1f}s)")

    prod = hm.Ciphered.new_from_raw(out_lanes, desc)
    got = [int(v) for v in ctx.decrypt(prod)]
    want = [(x * y) & mask for x, y in zip(xs, ys)]
    assert got == want, "staged product decrypts wrong"
    print("staged product decrypts correctly")

    rows = []
    dv, _ = device_busy(lambda: stage_pp((a, b)), reps=1)
    rows.append(("pp", dv, sol["pp"]))
    for k in range(len(plan.levels)):
        dv, _ = device_busy(lambda k=k: make_level(k)(states[k]), reps=1)
        rows.append((f"level{k}", dv, sol[f"level{k}"]))
    dv, _ = device_busy(lambda: stage_ripple(states[-1]), reps=1)
    rows.append(("ripple", dv, sol["ripple"]))

    tot_m = sum(r[1] or 0 for r in rows)
    tot_s = sum(r[2] for r in rows)
    print(f"{'stage':>8} {'measured':>12} {'clmul SOL':>12} {'SOL%':>6}")
    for name, m, s in rows:
        pct = 100 * s / m if m else 0
        print(f"{name:>8} {1e3 * (m or 0):>10.1f}ms {1e3 * s:>10.1f}ms {pct:>5.0f}%")
    print(f"{'TOTAL':>8} {1e3 * tot_m:>10.1f}ms {1e3 * tot_s:>10.1f}ms "
          f"{100 * tot_s / tot_m if tot_m else 0:>5.0f}%")
    print(f"peaks: {chip_peaks()}")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "u16")
