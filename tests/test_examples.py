"""Examples as integration tests.

The reference ships examples whose ``main`` asserts the full
keygen -> encrypt -> custom-op -> decrypt round-trip (reference:
examples/simple_struct.rs:60-72, examples/unbalanced_struct.rs:65-76) and
runs them in CI.  Mirror that: every script in examples/ must exit 0 when
run as a fresh interpreter (each one ends in asserts).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).resolve().parent.parent / "examples").glob("*.py"))


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(script: Path) -> None:
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",  # keep example processes off the TPU tunnel
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, str(script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=script.parent.parent,
    )
    assert proc.returncode == 0, (
        f"{script.name} failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
