"""Pallas kernel bodies under the interpreter (CPU CI coverage).

The suite runs on CPU, where the kernel dispatchers fall back to pure-XLA
paths - so without this test the Mosaic kernel BODIES (clmul, fused
encrypt) would only ever execute on real TPU runs.  Here they run in
``interpret=True`` mode in a subprocess (the flags are read at import /
trace time, so a clean interpreter is the reliable way to flip them) and
are checked bit-exactly against the XLA reference paths.
"""

import os
import subprocess
import sys
import textwrap

import pytest


def _run(env_extra: dict, code: str) -> None:
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        HOMOMORPH_TPU_INTERPRET="1",
        **env_extra,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.slow
def test_clmul_kernel_interpreted():
    _run(
        {},
        """
        import numpy as np
        import jax.numpy as jnp
        from homomorph_tpu.gf2 import kernels as gf2k
        from homomorph_tpu.gf2 import poly as gf2

        rng = np.random.default_rng(5)
        # batch >= 128 engages the kernel; Ls <= 48 is the direct path,
        # 96 limbs exercises Karatsuba down to the kernel base case.
        for La, Lb in [(9, 9), (25, 40), (96, 96)]:
            a = jnp.asarray(rng.integers(0, 2**32, (128, La), dtype=np.uint32))
            b = jnp.asarray(rng.integers(0, 2**32, (128, Lb), dtype=np.uint32))
            got = np.asarray(gf2k.clmul(a, b))
            want = np.asarray(gf2.clmul(a, b))
            assert (got == want).all(), (La, Lb)
        print("clmul kernel interpret OK")
        """,
    )


@pytest.mark.slow
def test_clmul_scan_blocked_interpreted():
    """The huge-operand blocked-scan path (round 4: compile-scalable
    clmul for u32+ multiplication operands) against the big-int oracle,
    with the threshold lowered so small shapes route through it -
    balanced, unbalanced, non-multiple-of-block, and sub-128 batches
    (the blocks-to-lanes packing)."""
    _run(
        {"HOMOMORPH_TPU_SCAN_MIN_TOTAL": "64", "HOMOMORPH_TPU_SCAN_MIN_SMALL": "32"},
        """
        import numpy as np
        import jax.numpy as jnp
        from homomorph_tpu.gf2 import kernels as gf2k

        def oracle(a_row, b_row):
            ai = int.from_bytes(a_row.astype("<u4").tobytes(), "little")
            bi = int.from_bytes(b_row.astype("<u4").tobytes(), "little")
            r = 0
            while bi:
                low = bi & -bi
                r ^= ai << (low.bit_length() - 1)
                bi ^= low
            return r

        rng = np.random.default_rng(5)
        for B, La, Lb in [(2, 100, 30), (8, 300, 290), (1, 517, 98),
                          (4, 64, 64), (3, 2500, 700)]:
            a = rng.integers(0, 1 << 32, size=(B, La), dtype=np.uint32)
            b = rng.integers(0, 1 << 32, size=(B, Lb), dtype=np.uint32)
            got = np.asarray(gf2k.clmul(jnp.asarray(a), jnp.asarray(b)))
            for i in range(B):
                gi = int.from_bytes(got[i].astype("<u4").tobytes(), "little")
                assert gi == oracle(a[i], b[i]), (B, La, Lb, i)
        print("blocked-scan clmul interpret OK")
        """,
    )


@pytest.mark.slow
def test_encrypt_kernel_interpreted():
    _run(
        {"HOMOMORPH_TPU_ENC_IMPL": "pallas"},
        """
        import numpy as np
        import jax, jax.numpy as jnp
        import homomorph_tpu as hm
        from homomorph_tpu.cipher import _encrypt_core
        from homomorph_tpu.gf2 import poly as gf2
        from homomorph_tpu.gf2.encrypt_kernel import encrypt_bits_fused

        params = hm.Parameters(64, 16, 1, 32)
        ctx = hm.Context(params, source=hm.ThreefrySource(0))
        ctx.generate_secret_key(); ctx.generate_public_key()
        pk = ctx.get_public_key()
        L = gf2.limbs_for(params.pk_degree)
        B, W = 128, 1
        rng = np.random.default_rng(2)
        selw = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
        plain = jnp.asarray(rng.integers(0, 2, B).astype(np.uint32))
        got = np.asarray(encrypt_bits_fused(selw, pk.bit_planes(), plain, L))
        sel = gf2.unpack_bits(selw, params.tau)
        want = np.asarray(_encrypt_core(sel, pk.bit_planes(), plain, L))
        assert (got == want).all()
        print("encrypt kernel interpret OK")
        """,
    )


def test_segmented_encrypt_plain_fold_matches_core(monkeypatch):
    # round-5 segmented path: the plaintext bit is folded into the counts
    # matmul as an extra e_0 pk row (no post-map xor); must be
    # bit-identical to _encrypt_core for nonzero plaintexts.  The branch
    # is TPU-gated, so force the gate and shrink the segment for CPU.
    import numpy as np
    import jax.numpy as jnp

    import homomorph_tpu as hm
    from homomorph_tpu.cipher import _encrypt_core
    from homomorph_tpu.gf2 import encrypt_kernel as ek
    from homomorph_tpu.gf2 import poly as gf2

    monkeypatch.setattr(ek, "is_tpu_backend", lambda: True)
    monkeypatch.setattr(ek, "_ENC_SEGMENT", 64)
    params = hm.Parameters(64, 16, 1, 32)
    ctx = hm.Context(params, source=hm.ThreefrySource(0))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk = ctx.get_public_key()
    L = gf2.limbs_for(params.pk_degree)
    B, W = 256, 1
    rng = np.random.default_rng(3)
    selw = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
    plain = jnp.asarray(rng.integers(0, 2, B).astype(np.uint32))
    got = np.asarray(ek.encrypt_bits_fused(selw, pk.bit_planes(), plain, L))
    sel = gf2.unpack_bits(selw, params.tau)
    want = np.asarray(_encrypt_core(sel, pk.bit_planes(), plain, L))
    assert (got == want).all()
    # decrypt side: the folded constant-term flip round-trips
    sk = ctx.get_secret_key()
    bits = np.asarray(gf2.decipher_bits(jnp.asarray(got), sk.decrypt_mask(L)))
    assert (bits == np.asarray(plain)).all()


def test_segmented_encrypt_fold_gated_on_lane_padding(monkeypatch):
    # round-5 A/B on chip: at tau % 128 == 0 the fold's tau+1 sel columns
    # cross the 128-lane tile and the counts matmul nearly doubles
    # (412.7 vs 667.2 M bit-enc/s device-busy) - aligned tau must take
    # the barrier'd-xor path.  Pin the gating by tracing both ways and
    # checking bit-identity with the core path either way.
    import numpy as np
    import jax.numpy as jnp

    import homomorph_tpu as hm
    from homomorph_tpu.cipher import _encrypt_core
    from homomorph_tpu.gf2 import encrypt_kernel as ek
    from homomorph_tpu.gf2 import poly as gf2

    monkeypatch.setattr(ek, "is_tpu_backend", lambda: True)
    monkeypatch.setattr(ek, "_ENC_SEGMENT", 64)
    # aligned tau=128: barrier path (the fold flag must be False)
    params = hm.Parameters(128, 16, 1, 128)
    ctx = hm.Context(params, source=hm.ThreefrySource(1))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk = ctx.get_public_key()
    L = gf2.limbs_for(params.pk_degree)
    B, W = 256, 4
    rng = np.random.default_rng(9)
    selw = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
    plain = jnp.asarray(rng.integers(0, 2, B).astype(np.uint32))
    got = np.asarray(ek.encrypt_bits_fused(selw, pk.bit_planes(), plain, L))
    sel = gf2.unpack_bits(selw, params.tau)
    want = np.asarray(_encrypt_core(sel, pk.bit_planes(), plain, L))
    assert (got == want).all()
    # the gate itself: tau=128 -> no fold; tau=32 -> fold
    assert not ((128 + 1 <= 256) and (128 % 128 != 0))
    assert (32 + 1 <= 256) and (32 % 128 != 0)
