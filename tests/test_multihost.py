"""Real 2-process exercise of parallel/multihost.py (VERDICT r3 item 7).

Spawns two CPU processes that form a jax.distributed cluster over a
localhost coordinator and run tests/_multihost_worker.py: initialize(),
both broadcast_from_host0 branches, assert_same_across_hosts (agree +
diverge), and a genuine cross-process SPMD commit whose collectives ride
the distributed runtime."""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_runtime():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own 1-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n---\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_{pid}_OK" in out, f"worker {pid} incomplete:\n{out}"
