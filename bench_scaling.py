"""Scaling-efficiency harness: same workload on 1..N devices.

Measures bulk bit-encryption throughput on meshes of increasing size and
reports parallel efficiency (the BASELINE north-star asks >= 80% at 2+
workers).  On this machine only one real TPU chip is reachable, so the
harness defaults to a virtual CPU device mesh
(``--xla_force_host_platform_device_count``), which validates the sharding
program structure and communication pattern; absolute numbers are
CPU-bound.  On a real pod slice the same code path runs over ICI.

Usage: python bench_scaling.py [--devices 8] [--bits 65536]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--bits", type=int, default=1 << 16)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    # Steer to a virtual CPU device mesh. The two overrides are independent:
    # the device-count flag is only added when absent, while the platform
    # override applies whenever the backend is still uninitialized (the host
    # sitecustomize imports jax at interpreter startup with
    # JAX_PLATFORMS=axon snapshotted into jax.config, so a pre-set XLA_FLAGS
    # must not leave the single-chip axon platform in place).
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if os.environ["JAX_PLATFORMS"] == "cpu":
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        backends_live = False
        try:
            from jax._src import xla_bridge

            backends_live = bool(getattr(xla_bridge, "_backends", None))
        except Exception:
            pass
        if not backends_live:
            try:
                jax_mod.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
            except Exception:
                pass

    import jax
    import jax.numpy as jnp
    import numpy as np

    import homomorph_tpu as hm
    from homomorph_tpu.gf2 import poly as gf2
    from homomorph_tpu.parallel import bulk, make_mesh

    n_avail = len(jax.devices())
    params = hm.Parameters(128, 128, 64, 128)
    ctx = hm.Context(params, source=hm.ThreefrySource(0))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk = ctx.get_public_key()
    L = gf2.limbs_for(params.pk_degree)
    B = args.bits

    rng = np.random.default_rng(0)
    plain = jnp.asarray(rng.integers(0, 2, size=(B, 1)).astype(np.uint32))
    sel = jnp.asarray(
        rng.integers(0, 2, size=(B, 1, params.tau)).astype(np.uint8)
    )

    results = {}
    n = 1
    while n <= n_avail:
        cfg = make_mesh(n, 1, devices=jax.devices()[:n])

        def step():
            return bulk.sharded_encrypt_bits(cfg, sel, pk.bit_planes(), plain, L)

        jax.block_until_ready(step())
        t0 = time.perf_counter()
        outs = [step() for _ in range(args.steps)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.steps
        results[n] = B / dt
        print(f"{n} devices: {B/dt:,.0f} bits/s", file=sys.stderr)
        n *= 2

    base = results[1]
    effs = {
        str(n): round(v / (base * n), 3) for n, v in results.items() if n > 1
    }
    payload = {
        "metric": "scaling_efficiency_bulk_encrypt",
        "throughput_bits_per_s": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency_vs_linear": effs,
        # on a shared-core virtual mesh the single-device program already
        # saturates the host (XLA CPU intra-op threading), so the
        # structure-validation criterion is throughput_n / throughput_1
        # staying ~1.0: the sharded program + collectives add no overhead
        "speedup_vs_single_device": {
            str(n): round(v / base, 3) for n, v in results.items() if n > 1
        },
        "devices": n_avail,
        "platform": jax.devices()[0].platform,
    }
    if jax.devices()[0].platform == "cpu":
        payload["physical_cores"] = os.cpu_count()
        payload["note"] = (
            "virtual CPU device mesh: devices share the host's cores (one "
            "device already saturates them via XLA's intra-op threadpool), "
            "so efficiency_vs_linear is bounded by cores/devices; this run "
            "validates program structure (shardings + collectives add no "
            "overhead - see speedup_vs_single_device), not ICI scaling"
        )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
