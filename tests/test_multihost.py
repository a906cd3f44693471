"""Multi-host DCN dry-run: two OS processes, jax.distributed bring-up,
dp-sharded batch decode across the global (2 hosts x 4 CPU devices)
mesh — proving the mesh code is host-count agnostic (ROADMAP
"Systems"; SURVEY §2 "DCN only for multi-host batch farming")."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_decode():
    port = _free_port()
    env = dict(os.environ)
    # the axon sitecustomize initializes a backend at import, which
    # jax.distributed.initialize forbids — scrub it for the workers
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    script = os.path.join(REPO, "tools", "multihost_dryrun.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, f"localhost:{port}", "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost dryrun timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid{pid} rc={p.returncode}\n{out[-2000:]}"
        assert f"MULTIHOST-OK pid={pid} devices=8" in out, out[-2000:]
