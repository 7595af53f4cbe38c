"""Tracing, profiling, and speed-of-light accounting.

The reference has no in-library tracing - only Criterion wall-clock
benches (reference: benches/u32.rs:52-56).  For a production TPU framework
the north-star metric requires per-kernel speed-of-light accounting
(SURVEY §5.1), provided here:

* :func:`trace` - context manager around ``jax.profiler`` for capturing
  device traces viewable in XProf/TensorBoard.
* :class:`Meter` - lightweight operation counters (ops, bits, bytes moved,
  wall time) for the batch APIs (SURVEY §5.5).
* :func:`clmul_sol` / :func:`encrypt_sol` / :func:`decrypt_sol` - analytic
  speed-of-light models for the three hot kernels on a given chip, used to
  report achieved-vs-peak fractions.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict


# Conservative public per-chip peaks for common TPU generations.
# (bf16 matmul FLOP/s, HBM bytes/s, VPU uint32 lane-ops/s)
_CHIP_PEAKS = {
    "v5e": dict(mxu_flops=197e12, hbm_bw=819e9, vpu_ops=1.4e12),
    "v5": dict(mxu_flops=459e12, hbm_bw=1228e9, vpu_ops=2.8e12),
    "v4": dict(mxu_flops=275e12, hbm_bw=1228e9, vpu_ops=2.0e12),
    "cpu": dict(mxu_flops=1e12, hbm_bw=100e9, vpu_ops=2e11),
}


def chip_peaks(device=None) -> dict:
    """Best-effort peak numbers for the current device.

    "lite" variants are checked BEFORE the bare generation match: a
    "TPU v5 lite" (v5e) would otherwise string-match the full "v5" entry
    and overstate HBM bandwidth 1.5x (1228 vs 819 GB/s), silently
    inflating every SOL fraction computed from it.
    """
    try:
        import jax

        kind = (device or jax.devices()[0]).device_kind.lower()
    except Exception:
        kind = "cpu"
    kind = kind.replace(" ", "")
    if "lite" in kind:
        return _CHIP_PEAKS["v5e"]
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks
    if "v5" in kind:
        return _CHIP_PEAKS["v5e"]
    return _CHIP_PEAKS["cpu"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/homomorph_tpu_trace"):
    """Capture a jax.profiler device trace (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


# --------------------------------------------------------------------------
# Speed-of-light models
# --------------------------------------------------------------------------


def clmul_sol(batch: int, La: int, Lb: int, device=None) -> float:
    """Lower-bound seconds for a batched carry-less multiply.

    Compute model (the shipped merged-pass kernel, gf2/kernels.py): 32 bit
    planes x (Lb+1) read-modify-write passes over La output rows, ~2 VPU
    ops per element (select + xor; the shifted operand is built once per
    row); memory model: read La+Lb limbs, write La+Lb.  The measured v5e
    kernel lands within ~1.2x of this compute bound (PERF.md).
    """
    peaks = chip_peaks(device)
    compute = batch * 32 * La * (Lb + 1) * 2 / peaks["vpu_ops"]
    memory = batch * (2 * (La + Lb)) * 4 / peaks["hbm_bw"]
    return max(compute, memory)


def encrypt_sol(
    batch_bits: int, tau: int, pk_bits: int, device=None, fused: bool = False
) -> float:
    """Lower-bound seconds to encrypt ``batch_bits`` bits.

    MXU: batch x tau x pk_bits MACs.  HBM: with ``fused=True`` (a kernel
    keeping sel/counts in VMEM - not currently profitable, see PERF.md)
    only selw in + limbs out move; the default models the shipped XLA
    pipeline, which additionally materializes sel (bf16, write+read) and
    counts (bf16, write+read) - the measured binding constraint: the v5e
    runs this at ~100% of achievable HBM bandwidth.
    """
    peaks = chip_peaks(device)
    compute = batch_bits * tau * pk_bits * 2 / peaks["mxu_flops"]
    per_bit_bytes = tau / 8 + pk_bits / 8
    if not fused:
        per_bit_bytes += 4 * tau + 4 * pk_bits  # bf16 sel + counts, w+r each
    memory = batch_bits * per_bit_bytes / peaks["hbm_bw"]
    return max(compute, memory)


def decrypt_sol(batch_bits: int, n_limbs: int, device=None) -> float:
    """Lower-bound seconds to decrypt: read L limbs/bit, AND+popcount+reduce."""
    peaks = chip_peaks(device)
    compute = batch_bits * n_limbs * 3 / peaks["vpu_ops"]
    memory = batch_bits * n_limbs * 4 / peaks["hbm_bw"]
    return max(compute, memory)


# --------------------------------------------------------------------------
# Device-busy measurement (profiler-trace parsing)
# --------------------------------------------------------------------------


def device_busy(fn, reps: int = 2):
    """Profiler-measured device-busy time of a jitted no-arg thunk.

    Runs ``fn()`` once to compile, then ``reps`` times under
    ``jax.profiler.trace`` and parses the trace: returns
    ``(jit_seconds_per_rep, {op_name: us_per_rep})`` where the first is
    the summed top-level ``jit_*`` event duration (the canonical
    device-busy number used by bench.py) and the second is the per-op
    breakdown from the device track (used by exp_add.py).  Returns
    ``(None, {})`` on any failure (e.g. profiler unsupported on the
    backend) - the one place this fragile trace-schema parsing lives.
    """
    import glob
    import gzip
    import json
    import tempfile
    from collections import defaultdict

    import jax

    try:
        with tempfile.TemporaryDirectory() as td:
            jax.block_until_ready(fn())
            with jax.profiler.trace(td):
                for _ in range(reps):
                    jax.block_until_ready(fn())
            ops = defaultdict(float)
            jit_us = 0.0
            for f in glob.glob(f"{td}/**/*.trace.json.gz", recursive=True):
                with gzip.open(f) as fh:
                    data = json.load(fh)
                pid_names = {
                    p["pid"]: p["args"].get("name", "")
                    for p in data.get("traceEvents", [])
                    if p.get("ph") == "M" and p.get("name") == "process_name"
                }
                for e in data.get("traceEvents", []):
                    if e.get("ph") != "X" or "dur" not in e:
                        continue
                    name = e.get("name", "")
                    pname = pid_names.get(e.get("pid"), "")
                    if name.startswith("jit_"):
                        jit_us += e["dur"]
                    elif "TPU" in pname or "/device" in pname.lower():
                        ops[name] += e["dur"]
            if jit_us <= 0:
                return None, {}
            return jit_us / reps / 1e6, {k: v / reps for k, v in ops.items()}
    except Exception:
        return None, {}


# --------------------------------------------------------------------------
# Counters
# --------------------------------------------------------------------------


@dataclasses.dataclass
class _Stat:
    calls: int = 0
    items: int = 0
    seconds: float = 0.0


class Meter:
    """Operation counters for observability around the batch APIs.

    Usage::

        meter = Meter()
        with meter.measure("encrypt", items=batch_bits):
            ct = ctx.encrypt(...)
        print(meter.report())
    """

    def __init__(self):
        self._stats: dict[str, _Stat] = defaultdict(_Stat)

    @contextlib.contextmanager
    def measure(self, name: str, items: int = 1):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self._stats[name]
            s.calls += 1
            s.items += items
            s.seconds += dt

    def report(self) -> dict[str, dict]:
        out = {}
        for name, s in sorted(self._stats.items()):
            out[name] = {
                "calls": s.calls,
                "items": s.items,
                "seconds": round(s.seconds, 6),
                "items_per_s": round(s.items / s.seconds, 1) if s.seconds else None,
            }
        return out

    def reset(self) -> None:
        self._stats.clear()
