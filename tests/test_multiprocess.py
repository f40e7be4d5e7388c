"""REAL process_count>1 coverage: two OS processes, 4 virtual CPU
devices each, joined by jax.distributed into one 8-device mesh.

Exercises the paths no single-process test can reach (SURVEY.md §5.8,
reference run.py:92-112 DDP semantics):
  * jax.distributed.initialize + cross-process device discovery
  * host_local_array_to_global_array batch assembly (the reference's
    DistributedSampler rank split)
  * XLA-inserted cross-process gradient reduction inside the jitted
    RMCL step (loss must be bitwise-identical on every process)
  * parallel/comm.py object all_gather + barrier over DCN
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_rmcl_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_mp_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MP_RESULT")]
        assert lines, f"no MP_RESULT in worker output:\n{out[-4000:]}"
        _, pid, l1, l2, ok = lines[0].split()
        results[int(pid)] = (float(l1), float(l2), int(ok))

    assert set(results) == {0, 1}
    # single-controller SPMD: every process computes the same global loss
    assert results[0][0] == results[1][0]
    assert results[0][1] == results[1][1]
    # the step actually trained (loss changed) and gathers worked
    assert results[0][0] != results[0][1]
    assert results[0][2] == 1 and results[1][2] == 1
