"""The on-device verification gate itself must pass on this backend (CPU
interpret mode here; bench.py runs the same gate on the real chip) and
must FAIL loudly when a kernel returns wrong bits."""

import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu import verify as V


def test_run_verification_quick_passes():
    hm.run_verification(quick=True, log=lambda *a: None)


def test_oracle_helpers():
    # big-int clmul/rem oracles agree with hand values
    assert V._int_clmul(0b1001, 0b11) == 0b11011
    assert V._int_rem(0b1010101101, 0b11011) == 0b1010
    row = np.array([0x01020304, 0x0A0B0C0D], dtype=np.uint32)
    assert V._limbs_to_int(row) == 0x0A0B0C0D01020304
    assert (V._int_to_limbs(V._limbs_to_int(row), 2) == row).all()


@pytest.mark.slow
def test_scaled_roundtrip_check_passes():
    # the d=dp=1024 tau=256 gate (round-3 verdict item 8) on this backend
    failures = []
    V._check_roundtrip_scaled(failures, lambda *a: None)
    assert failures == []


def test_failure_is_loud(monkeypatch):
    # sabotage the golden-vector check's expectation path by patching the
    # oracle; the gate must raise VerificationError, not warn
    monkeypatch.setattr(V, "_int_rem", lambda c, s: 0xDEAD)
    with pytest.raises(hm.VerificationError, match="FAILED"):
        hm.run_verification(quick=True, log=lambda *a: None)
