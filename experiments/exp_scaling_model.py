"""Analytic ICI/DCN scaling model for the three parallel axes.

Only one physical TPU chip is reachable in this environment (SCALING.md),
so real multi-chip efficiency cannot be measured here.  This model is the
honest substitute the round-4 verdict asked for: it combines

* MEASURED single-chip device-busy rates (BENCH_r03/r04, PERF.md), and
* MEASURED communication volumes (compiled-HLO inspection, SCALING.md:
  the tau collective's bytes/bit, the limb-sharded clmul's single
  collective-permute of the small operand),

with ASSUMED per-generation link bandwidths (public figures; replace
``CHIPS`` entries with a measured link bandwidth to recalibrate - every
prediction scales linearly in it), and prints predicted efficiency
tables at 2/4/8 chips (ICI) and 2 hosts (DCN) for the BASELINE configs.

Model: serialized compute + communication (NO overlap - conservative;
XLA can overlap the tau collective with the next batch's matmul, so
measured efficiency should sit AT OR ABOVE these numbers):

    T_n  = T_1 / n + bytes_per_chip(n) / bandwidth
    eff  = T_1 / (n * T_n)

What would falsify it (per axis, listed with each table below):
measured per-link bandwidth materially below the assumed figure,
a collective that does not ride the modeled path (e.g. a tau psum
falling onto DCN because the mesh axis spans hosts), or XLA inserting
re-layouts around the collective that the HLO inspection did not show.

Run:  python experiments/exp_scaling_model.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import math

# -- assumed hardware figures (per chip generation) -------------------------
# ici_link: ONE-WAY bytes/s of a single ICI link (butterfly steps use one
# link; ring reductions can drive two directions -> ring_bw = 2 * ici_link).
# dcn: per-host one-way bytes/s across the data-center network.
# These are public ballpark figures, NOT measured here - the falsification
# knob.  hbm is the measured-roofline basis already used by PERF.md.
CHIPS = {
    "v5e": {"ici_link": 45e9, "ici_links": 4, "dcn": 25e9, "hbm": 810e9},
    "v5p": {"ici_link": 90e9, "ici_links": 6, "dcn": 25e9, "hbm": 2765e9},
}

# -- measured single-chip bases (device-busy; provenance in comments) -------
MEASURED = {
    # segmented encrypt pipeline, nonzero plaintexts, B=2^21 (PERF.md r4)
    "enc128_bits_per_s": 613e6,
    # scaled d=dp=1024 tau=256 encrypt, B=2^20 (BENCH_local_r03 extras)
    "enc1024_bits_per_s": 80.2e6,
    # headline decrypt, L=9 (PERF.md: 10.8G on-silicon)
    "dec128_bits_per_s": 10.8e9,
    # u32 ripple-carry add, B=2048 (BENCH_r03/r04 device-busy)
    "add_u32_per_s": 99.7e3,
}

# pk bit-plane width D (packed positions rounded to limb boundary * 32)
D128 = 288     # d=dp=128:  limbs_for(256)=9  -> 288 bf16 columns
D1024 = 2080   # d=dp=1024: limbs_for(2048)=65 -> 2080 columns


def eff_dp(n: int) -> float:
    """Pure data parallelism: zero steady-state communication.  The only
    cost is the once-per-job key broadcast (pk = tau*(D/8) bytes, ~4.6 KB
    at the headline config) - amortized over any realistic batch count it
    is < 0.1%, so the model reports the steady-state 1.0."""
    return 1.0


def eff_tau(
    n: int, per_bit_s: float, D: int, chip: dict, packed: bool
) -> float:
    """tau-sharded encrypt.

    packed=False - the counts-domain psum (pre-round-5): ring all-reduce
    of f32 counts, 2*(n-1)/n * 4*D bytes/bit/chip at ring bandwidth
    (2 links).
    packed=True - the round-5 parity-domain butterfly: log2(n) ppermute
    steps of packed u32 limbs, log2(n) * D/8 bytes/bit/chip at one-link
    bandwidth.
    """
    t_comp = per_bit_s / n
    if packed:
        bytes_per_bit = math.log2(n) * (D / 8)
        bw = chip["ici_link"]
    else:
        bytes_per_bit = 2 * (n - 1) / n * 4 * D
        bw = 2 * chip["ici_link"]
    t_comm = bytes_per_bit / bw
    return per_bit_s / (n * (t_comp + t_comm))


def eff_limb(
    n: int, B: int, La: int, Lb: int, chip: dict
) -> float:
    """Limb-sharded clmul (parallel/limbmul.py): the long operand's limb
    axis is sharded; HLO shows exactly ONE collective-permute of the
    small operand's boundary spill, u32[B, Lb] per chip hop
    (SCALING.md: 14.4 MB/product at the scaled adder step vs the ~2.6 GB
    a full-product XOR all-reduce would move).

    Compute basis: the kernel's speed-of-light model
    (utils/profiling.clmul_sol, measured within ~1.2x on v5e): 32 planes
    x (Lb+1) passes x 2 VPU ops over La rows, VPU peak ~4e13 ops/s.
    """
    vpu = 3.94e13  # v5e 8-bit-lane VPU ops/s (utils/profiling.chip_peaks)
    t_comp1 = B * 32 * La * (Lb + 1) * 2 / vpu
    t_comm = B * Lb * 4 / chip["ici_link"]  # one ppermute hop, per chip
    return t_comp1 / (n * (t_comp1 / n + t_comm))


def eff_dcn_dp(n_hosts: int, step_s: float, chip: dict,
               staged_bytes: float = 0.0) -> float:
    """DP across hosts over DCN: steady-state comm is zero; if plaintext
    inputs are centrally staged, they cost staged_bytes/host/step."""
    t = step_s / n_hosts + staged_bytes / chip["dcn"]
    return step_s / (n_hosts * t)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out: dict = {"assumptions": CHIPS, "measured_basis": MEASURED, "tables": {}}
    ns = (2, 4, 8)

    print("== Predicted scaling efficiency (serialized-comm model; ==")
    print("==  measured single-chip bases + assumed link bandwidths) ==\n")

    for gen, chip in CHIPS.items():
        rows = []
        print(f"--- {gen} (ici one-way/link {chip['ici_link']/1e9:.0f} GB/s, "
              f"dcn {chip['dcn']/1e9:.0f} GB/s ASSUMED) ---")
        print(f"{'axis / config':<46}" + "".join(f"  n={n}" for n in ns))
        configs = [
            ("DP bulk encrypt (any config, ICI or DCN)",
             [eff_dp(n) for n in ns]),
            ("tau enc d=128 counts-psum (pre-r5)",
             [eff_tau(n, 1 / MEASURED["enc128_bits_per_s"], D128, chip, False)
              for n in ns]),
            ("tau enc d=128 packed-butterfly (r5)",
             [eff_tau(n, 1 / MEASURED["enc128_bits_per_s"], D128, chip, True)
              for n in ns]),
            ("tau enc d=1024 counts-psum (pre-r5)",
             [eff_tau(n, 1 / MEASURED["enc1024_bits_per_s"], D1024, chip, False)
              for n in ns]),
            ("tau enc d=1024 packed-butterfly (r5)",
             [eff_tau(n, 1 / MEASURED["enc1024_bits_per_s"], D1024, chip, True)
              for n in ns]),
            ("limb clmul scaled add step (B=4096,La=16384,Lb=129)",
             [eff_limb(n, 4096, 16384, 129, chip) for n in ns]),
            ("limb clmul u32-mul scale (B=256,La=524288,Lb=1024)",
             [eff_limb(n, 256, 524288, 1024, chip) for n in ns]),
        ]
        for label, effs in configs:
            rows.append({"config": label, "eff": dict(zip(map(str, ns), effs))})
            print(f"{label:<46}" + "".join(f"  {e:4.2f}" for e in effs))
        e2h = eff_dcn_dp(2, 1.0, chip)
        rows.append({"config": "DP 2 hosts over DCN", "eff": {"2": e2h}})
        print(f"{'DP encrypt, 2 hosts over DCN':<46}  {e2h:4.2f}"
              f"   <- the BASELINE >=80% target rides THIS axis")
        print()
        out["tables"][gen] = rows

    print("""Reading:
* The production scale axis is DP (bit-parallel): zero steady-state
  communication, predicted ~1.00 at any chip or host count - the
  BASELINE >=80%-at-2-hosts target has structural margin; what would
  falsify it is per-step host orchestration overhead, not bandwidth.
* tau sharding is a capacity/latency axis, not a throughput axis: even
  with the round-5 packed-domain butterfly (8-32x less traffic than the
  counts psum it replaces) the collective costs O(D/8 * log n) bytes
  against O(1.6ns) of compute per bit, capping 2-chip efficiency near
  0.5 at the headline config.  Use it when the pk or sel tensors
  exceed one chip's HBM (d=dp>=4096) or to halve small-batch latency.
* Limb sharding is near-linear at both modeled shapes (>=0.97): the
  boundary spill (B*Lb*4 bytes) is independent of the sharded length La,
  so the comm/compute ratio only shrinks as products grow - exactly why
  the dispatcher shards only sufficiently large, unbalanced products
  (small ones pay the hop for too little compute).
Falsification: measure one ppermute's achieved GB/s on a real slice; if
it lands within 2x of the assumed link figure, these tables hold to the
same factor (everything is linear in bandwidth).""")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
