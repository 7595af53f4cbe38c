"""On-device correctness gate: run the production kernels on the REAL
backend and assert bit-exact results before trusting any benchmark number.

Why this exists: the test suite runs on a virtual CPU mesh with Pallas in
interpret mode (tests/conftest.py), so the Mosaic/TPU compile path is
otherwise exercised only by timing code.  A real Mosaic miscompile
(shift-after-lane-slice dropping a byte) was found by hand in round 2
(PERF.md); this module makes that class of failure impossible to miss:
``bench.py`` refuses to emit JSON unless :func:`run_verification` passes
on the chip it is about to time.

Reference analogue: the hand-computed golden vectors
(src/polynomial.rs:428-613) always execute on the reference's production
target; here the same vectors (and full encrypt->circuit->decrypt
round-trips with NONZERO plaintexts) run through the exact dispatch paths
the benchmarks use - the Pallas small-operand kernel, the strip
decomposition, the Karatsuba recursion, the fused encrypt pipeline, and
the linear-map decrypt.
"""

from __future__ import annotations

import numpy as np

__all__ = ["VerificationError", "run_verification"]


class VerificationError(AssertionError):
    """A production kernel returned wrong bits on the active backend."""


# --------------------------------------------------------------------------
# Host oracle (Python big-int carry-less arithmetic - trivially correct)
# --------------------------------------------------------------------------


def _limbs_to_int(row: np.ndarray) -> int:
    return int.from_bytes(np.asarray(row, dtype="<u4").tobytes(), "little")


def _int_to_limbs(x: int, L: int) -> np.ndarray:
    return np.frombuffer(x.to_bytes(4 * L, "little"), dtype="<u4").astype(np.uint32)


def _int_clmul(x: int, y: int) -> int:
    r = 0
    while y:
        lsb = y & -y
        r ^= x << (lsb.bit_length() - 1)
        y ^= lsb
    return r


def _int_rem(c: int, s: int) -> int:
    ds = s.bit_length() - 1
    while c.bit_length() - 1 >= ds and c:
        c ^= s << (c.bit_length() - 1 - ds)
    return c


# --------------------------------------------------------------------------
# Checks
# --------------------------------------------------------------------------


def _check_clmul_shapes(failures: list[str], log) -> None:
    """Fuzz the clmul dispatcher against the big-int oracle at shapes that
    hit each dispatch path: the <=48-limb Pallas kernel, the strip
    decomposition (small operand > 48 limbs), and the Karatsuba recursion
    (both operands >= 64 limbs).  Batches >= 128 fill the kernel's lane
    axis so the Mosaic-compiled kernel (not a fallback) runs."""
    import jax.numpy as jnp

    from .gf2 import kernels as gf2k

    rng = np.random.default_rng(0xC1A0)
    shapes = [
        ("pallas_small", 8, 8, 256),
        ("strip", 72, 56, 128),
        ("karatsuba", 64, 64, 128),
    ]
    for name, La, Lb, B in shapes:
        a = rng.integers(0, 1 << 32, size=(B, La), dtype=np.uint32)
        b = rng.integers(0, 1 << 32, size=(B, Lb), dtype=np.uint32)
        got = np.asarray(gf2k.clmul(jnp.asarray(a), jnp.asarray(b)))
        # oracle-check a sample of rows (the kernel is batch-uniform; a
        # per-row miscompile would hit every row of the affected lane)
        for i in range(0, B, max(1, B // 16)):
            want = _int_clmul(_limbs_to_int(a[i]), _limbs_to_int(b[i]))
            if _limbs_to_int(got[i]) != want:
                failures.append(
                    f"clmul[{name}] row {i}: device product != big-int oracle"
                )
                break
        else:
            log(f"verify: clmul[{name}] ({La}x{Lb} limbs, B={B}) ok")


def _check_golden_vectors(failures: list[str], log) -> None:
    """The reference's hand-computed vectors (src/polynomial.rs:522-591)
    through the device mul/rem paths, broadcast across a full 128-lane
    batch so the production kernel (not a scalar fallback) executes."""
    import jax.numpy as jnp

    from .gf2 import kernels as gf2k
    from .gf2 import poly as gf2

    B = 128
    # (X^3 + 1)(X + 1) = X^4 + X^3 + X + 1  (polynomial.rs:538-547)
    a = jnp.broadcast_to(jnp.asarray([[0b1001]], jnp.uint32), (B, 1))
    b = jnp.broadcast_to(jnp.asarray([[0b11]], jnp.uint32), (B, 1))
    got = np.asarray(gf2k.clmul(a, b))
    if not (got[:, 0] == 0b11011).all() or got[:, 1:].any():
        failures.append("golden mul vector (X^3+1)(X+1) wrong on device")
    else:
        log("verify: golden mul vector ok")

    # rem vectors (polynomial.rs:563-582): X^9+X^7+X^5+X^3+X^2+1 mod
    # X^4+X^3+X+1 = X^3+X; and 1 mod X = 1? -> reference: 1 mod X has
    # remainder 1 (degree 0 < 1).
    c = jnp.broadcast_to(jnp.asarray([[0b1010101101, 0]], jnp.uint32), (B, 2))
    s = jnp.asarray([0b11011], jnp.uint32)
    r = np.asarray(gf2.rem_iterative(c, s, 4))
    want = _int_rem(0b1010101101, 0b11011)
    if not (r[:, 0] == want).all() or r[:, 1:].any():
        failures.append("golden rem vector wrong on device (rem_iterative)")
    else:
        log("verify: golden rem vector ok")

    # linear-map reduction (the decrypt production path) must agree
    rows = gf2.reduction_rows(s, 4, gf2.bit_capacity(2))
    rl = np.asarray(gf2.rem_linear(c, rows))
    if not (rl[:, 0] == want).all():
        failures.append("rem_linear disagrees with golden rem vector on device")
    else:
        log("verify: linear-map reduction ok")


def _check_roundtrip(failures: list[str], log) -> None:
    """Encrypt -> decrypt round-trip with NONZERO plaintexts at the
    headline bench config (d=dp=tau=128), through the same fused path
    bench.py times."""
    import jax
    import jax.numpy as jnp

    from . import Context, Parameters, U32 as U32desc
    from .gf2 import poly as gf2
    from .gf2.encrypt_kernel import encrypt_bits_fused

    params = Parameters(128, 128, 64, 128)
    ctx = Context(params, encrypt_seed=0xF00D)
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk, sk = ctx.get_public_key(), ctx.get_secret_key()

    rng = np.random.default_rng(7)
    B = 4096
    plain = rng.integers(0, 2, size=B, dtype=np.uint32)
    L = gf2.limbs_for(params.pk_degree)
    W = -(-params.tau // 32)
    selw = jax.random.bits(jax.random.key(3), (B, W), dtype=jnp.uint32)
    ct = encrypt_bits_fused(selw, pk.bit_planes(), jnp.asarray(plain), L)
    bits = np.asarray(gf2.decipher_bits(ct, sk.decrypt_mask(L)))
    if not (bits == plain).all():
        n_bad = int((bits != plain).sum())
        failures.append(
            f"encrypt->decrypt round-trip: {n_bad}/{B} bits wrong (fused path)"
        )
    else:
        log(f"verify: fused encrypt->decrypt round-trip ok ({B} nonzero bits)")

    # typed-value path (what entry()/examples use)
    vals = [int(v) for v in rng.integers(0, 2**32, size=32, dtype=np.uint64)]
    c = ctx.encrypt(vals, U32desc, batch=True)
    got = [int(v) for v in ctx.decrypt(c)]
    if got != vals:
        failures.append("typed u32 encrypt->decrypt round-trip wrong")
    else:
        log("verify: typed u32 round-trip ok (32 values)")


def _check_circuits(failures: list[str], log, with_mul: bool) -> None:
    """u8 add (and optionally mul) on-device, decrypted and compared -
    at parameters satisfying the EXACT noise bounds (models/noise.py), so
    a mismatch can only be a kernel/compile bug, never a noise artifact."""
    from . import Context, Parameters, U8
    from .models import circuits

    rng = np.random.default_rng(21)
    B = 128  # fills the Pallas lane axis inside the circuit clmuls

    # add: u8 requirement is 17 (models/noise.py) <= d/delta = 64
    ctx = Context(Parameters(64, 16, 1, 16), encrypt_seed=11)
    ctx.generate_secret_key()
    ctx.generate_public_key()
    xs = [int(v) for v in rng.integers(0, 256, size=B)]
    ys = [int(v) for v in rng.integers(0, 256, size=B)]
    a = ctx.encrypt(xs, U8, batch=True)
    b = ctx.encrypt(ys, U8, batch=True)
    got = [int(v) for v in ctx.decrypt(circuits.add(a, b))]
    want = [(x + y) & 0xFF for x, y in zip(xs, ys)]
    if got != want:
        failures.append("u8 homomorphic add wrong on device")
    else:
        log(f"verify: u8 add ok ({B} random operand pairs)")

    # compare (tree comparator): requirement 19 <= 64
    lt = [bool(v) for v in ctx.decrypt(circuits.lt(a, b))]
    if lt != [x < y for x, y in zip(xs, ys)]:
        failures.append("u8 homomorphic lt wrong on device")
    else:
        log("verify: u8 lt ok")

    if not with_mul:
        return
    # mul: u8 exact requirement is 65 (tree circuit + round-5 majority
    # ripple, models/noise.py)
    # <= d/delta = 160
    mctx = Context(Parameters(160, 16, 1, 16), encrypt_seed=13)
    mctx.generate_secret_key()
    mctx.generate_public_key()
    xs = [int(v) for v in rng.integers(0, 256, size=B)]
    ys = [int(v) for v in rng.integers(0, 256, size=B)]
    a = mctx.encrypt(xs, U8, batch=True)
    b = mctx.encrypt(ys, U8, batch=True)
    got = [int(v) for v in mctx.decrypt(circuits.mul_unsigned(a, b))]
    want = [(x * y) & 0xFF for x, y in zip(xs, ys)]
    if got != want:
        failures.append("u8 homomorphic mul wrong on device")
    else:
        log(f"verify: u8 mul ok ({B} random operand pairs)")


def _check_roundtrip_scaled(failures: list[str], log) -> None:
    """Encrypt -> decrypt round-trip at the SCALED config (d=dp=1024,
    tau=256) with nonzero plaintexts - the correctness gate in front of
    bench.py's scaled_1024_* numbers (round-3 verdict item 8: those
    timings previously ran with no assert at this config)."""
    import jax
    import jax.numpy as jnp

    from . import Context, Parameters
    from .gf2 import poly as gf2
    from .gf2.encrypt_kernel import encrypt_bits_fused

    params = Parameters(1024, 1024, 64, 256)
    ctx = Context(params, encrypt_seed=0x5CA1ED)
    ctx.generate_secret_key()
    ctx.generate_public_key()
    pk, sk = ctx.get_public_key(), ctx.get_secret_key()

    rng = np.random.default_rng(17)
    B = 4096
    plain = rng.integers(0, 2, size=B, dtype=np.uint32)
    L = gf2.limbs_for(params.pk_degree)
    W = -(-params.tau // 32)
    selw = jax.random.bits(jax.random.key(5), (B, W), dtype=jnp.uint32)
    ct = encrypt_bits_fused(selw, pk.bit_planes(), jnp.asarray(plain), L)
    bits = np.asarray(gf2.decipher_bits(ct, sk.decrypt_mask(L)))
    if not (bits == plain).all():
        n_bad = int((bits != plain).sum())
        failures.append(
            f"SCALED d=dp=1024 tau=256 round-trip: {n_bad}/{B} bits wrong"
        )
    else:
        log(f"verify: scaled d=dp=1024 tau=256 round-trip ok ({B} bits)")


def run_verification(quick: bool = False, log=None, scaled: bool = True) -> None:
    """Run every on-device correctness check; raise
    :class:`VerificationError` listing all failures.

    ``quick=True`` skips the multiplier circuit (its first compile is the
    expensive one); everything else always runs.  ``scaled=False`` skips
    the d=dp=1024 round-trip - callers that will not time the scaled
    config (bench.py --quick / --skip-scaled) may omit its keygen cost.
    There is no soft-fail mode: callers that want to skip must do so
    explicitly (bench.py honors ``HOMOMORPH_TPU_SKIP_VERIFY=1`` and says
    so on stderr).
    """
    if log is None:
        def log(*a):  # pragma: no cover - default stderr logger
            import sys

            print(*a, file=sys.stderr)

    failures: list[str] = []
    _check_clmul_shapes(failures, log)
    _check_golden_vectors(failures, log)
    _check_roundtrip(failures, log)
    _check_circuits(failures, log, with_mul=not quick)
    if scaled and not quick:
        _check_roundtrip_scaled(failures, log)
    if failures:
        raise VerificationError(
            "on-device verification FAILED:\n  - " + "\n  - ".join(failures)
        )
