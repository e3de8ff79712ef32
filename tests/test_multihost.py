"""Executed multi-host initialization (VERDICT r2 item 6).

Spawns two real OS processes that call jax.distributed.initialize with an explicit
coordinator, build a mesh over the GLOBAL (2-process) device set, and run ONE
sharded train step — the exact code path train.py:85-88 turns on via cfg.multihost.
The reference has no distributed capability at all (SURVEY.md §2.2); this test makes
the framework's multi-host claim an executed fact rather than wiring.

Both workers must agree on the (replicated) loss: the gradient psum crosses the
process boundary, so a silent de-sync would show up as diverging replicas.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mh_worker.py")


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    try:
        port = _free_port()
    except OSError as e:  # no loopback sockets in this sandbox
        pytest.skip(f"sockets unavailable: {e}")
    coord = f"127.0.0.1:{port}"
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert "MH_OK" in out, f"worker {i} missing marker:\n{out[-4000:]}"
    losses = [line.split("loss=")[1] for out in outs for line in out.splitlines()
              if line.startswith("MH_OK")]
    assert len(losses) == 2
    assert losses[0] == losses[1], f"replicas de-synced: {losses}"
