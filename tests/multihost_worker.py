"""Worker process for the multi-host smoke test (see test_multihost.py).

Runs as ONE of two cooperating processes: initializes jax.distributed
against a localhost coordinator, builds the global mesh through
homomorph_tpu.parallel.distributed, and drives a bulk encrypt/decrypt
round-trip whose tau-psum collective crosses the process boundary.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # skip axon PJRT registration
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception as e:  # jaxlib without gloo: report a clean skip
    print(f"SKIP: no gloo cpu collectives ({e})", flush=True)
    sys.exit(0)

import numpy as np  # noqa: E402


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import homomorph_tpu as hm
    from homomorph_tpu.gf2 import poly as gf2
    from homomorph_tpu.parallel import bulk, distributed

    distributed.initialize(f"127.0.0.1:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * nprocs, n_global

    # (data=nprocs, tau=2) global mesh: the data axis spans PROCESSES (the
    # DCN analogue), the tau axis spans each process's local devices
    cfg = distributed.global_mesh(n_tau=2)

    # key distribution: process 0 generates, everyone else receives the
    # exact key BYTES over the coordinator fabric (the production
    # bootstrap - distributed.broadcast_keys), then all processes verify
    # byte-identity
    params = hm.Parameters(64, 8, 1, 8)
    ctx = hm.Context(params, source=hm.ThreefrySource(0))
    if pid == 0:
        ctx.generate_secret_key()
        ctx.generate_public_key()
    distributed.broadcast_keys(ctx)
    pk, sk = ctx.get_public_key(), ctx.get_secret_key()
    distributed.assert_same_across_processes(sk.to_bytes(), "secret key")
    distributed.assert_same_across_processes(
        b"".join(pk.to_bytes()), "public key"
    )
    L = gf2.limbs_for(params.pk_degree)

    # identical global inputs on every process
    rng = np.random.default_rng(7)
    B, n = 4 * nprocs, 8
    xs = rng.integers(0, 256, size=B).astype(np.uint8)
    bits = np.unpackbits(xs[:, None], axis=1, bitorder="little").astype(np.uint32)
    sel = rng.integers(0, 2, size=(B, n, params.tau)).astype(np.uint8)

    ct = bulk.sharded_encrypt_bits(cfg, sel, pk.bit_planes(), bits, L)
    out = bulk.sharded_decrypt_bits(cfg, ct, sk.decrypt_mask(L))

    # every process checks its ADDRESSABLE shards against the expectation
    for shard in out.addressable_shards:
        got = np.asarray(shard.data)
        want = bits[shard.index[0]]
        assert (got == want).all(), (pid, shard.index, got, want)

    # sharded-ciphertext checkpoint across the process boundary: every
    # process writes its shards, process 0's manifest completes the set,
    # and the restored ciphertext decrypts identically
    import tempfile

    ckpt_dir = os.path.join(tempfile.gettempdir(), f"hmckpt_{port}")
    wrapped = hm.Ciphered.new_from_raw(ct, hm.BytesDescriptor(B * n // 8),
                                       bound=params.pk_degree,
                                       noise=hm.cipher.FRESH_NOISE)
    distributed.save_sharded(ckpt_dir, wrapped, name="mh")
    # rendezvous: both processes must have written before anyone loads
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    restored = distributed.load_sharded(ckpt_dir, wrapped.desc, name="mh")
    host = np.asarray(restored.limbs)
    assert host.shape == ct.shape, (host.shape, ct.shape)
    # the global array spans processes, so compare shard-by-shard: every
    # ADDRESSABLE piece of the original must match the restored assembly
    for shard in ct.addressable_shards:
        assert np.array_equal(host[shard.index], np.asarray(shard.data)), (
            f"sharded checkpoint round-trip mismatch at {shard.index}"
        )

    # limb-sharded clmul whose ppermute boundary exchange crosses the
    # process boundary (round-3 verdict item 3): a 1-D "limb" mesh over
    # ALL global devices - shards 0..1 live on process 0, 2..3 on
    # process 1, so the one-hop spill at shard 1->2 rides the DCN
    # analogue.  Checked row-by-row against the big-int oracle.
    from jax.sharding import Mesh
    from homomorph_tpu.parallel import limbmul

    limb_mesh = Mesh(np.array(jax.devices()), ("limb",))
    rng2 = np.random.default_rng(11)
    Bc, La, Lb = 2, 64, 4
    a = rng2.integers(0, 1 << 32, size=(Bc, La), dtype=np.uint32)
    bsmall = rng2.integers(0, 1 << 32, size=(Bc, Lb), dtype=np.uint32)
    prod = limbmul.sharded_clmul(
        jax.numpy.asarray(a), jax.numpy.asarray(bsmall), limb_mesh
    )

    def _int(v):
        return int.from_bytes(np.ascontiguousarray(v).astype("<u4").tobytes(),
                              "little")

    want_rows = np.zeros((Bc, La + Lb), dtype=np.uint32)
    for i in range(Bc):
        ai, bi, r = _int(a[i]), _int(bsmall[i]), 0
        while bi:
            low = bi & -bi
            r ^= ai << (low.bit_length() - 1)
            bi ^= low
        want_rows[i] = np.frombuffer(
            r.to_bytes(4 * (La + Lb), "little"), dtype=np.uint32
        )
    # the product is limb-sharded across processes: each process checks
    # its ADDRESSABLE limb slices against the oracle
    n_checked = 0
    for shard in prod.addressable_shards:
        got = np.asarray(shard.data)
        assert (got == want_rows[shard.index]).all(), (
            f"sharded clmul shard {shard.index} wrong on pid {pid}"
        )
        n_checked += 1
    assert n_checked > 0

    # optional bulk-encrypt timing across the process boundary (the
    # 2-process point of the scaling curve; SCALING.md)
    if os.environ.get("MULTIHOST_BENCH") == "1":
        import time

        Bb, nb = 2048 * nprocs, 8
        bits_b = np.zeros((Bb, nb), dtype=np.uint32)
        sel_b = rng.integers(0, 2, size=(Bb, nb, params.tau)).astype(np.uint8)
        jax.block_until_ready(
            bulk.sharded_encrypt_bits(cfg, sel_b, pk.bit_planes(), bits_b, L)
        )
        t0 = time.perf_counter()
        steps = 6
        outs = [
            bulk.sharded_encrypt_bits(cfg, sel_b, pk.bit_planes(), bits_b, L)
            for _ in range(steps)
        ]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / steps
        print(
            f"MULTIHOST BENCH pid={pid} {Bb * nb / dt:,.0f} bits/s "
            f"({nprocs} processes)",
            flush=True,
        )

    print(f"MULTIHOST OK pid={pid} devices={n_global}", flush=True)


if __name__ == "__main__":
    main()
