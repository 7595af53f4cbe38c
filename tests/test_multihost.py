"""Multi-host smoke test (VERDICT r1 item 7; SURVEY §5.8).

Launches TWO separate processes that rendezvous through a localhost
jax.distributed coordinator, build the global mesh via
``homomorph_tpu.parallel.distributed`` (2 processes x 2 virtual CPU devices
= a (data=2, tau=2) mesh whose data axis crosses the process boundary - the
DCN analogue), and run the sharded encrypt -> decrypt round-trip, with the
tau-psum collective crossing processes.  Skips cleanly when the jaxlib has
no gloo CPU collectives.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_roundtrip():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(WORKER)), env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers timed out; outputs so far: {outs}")

    if any("SKIP:" in o for o in outs):
        pytest.skip(f"cpu collectives unavailable: {outs}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args} failed:\n{out}"
        assert "MULTIHOST OK" in out, out
