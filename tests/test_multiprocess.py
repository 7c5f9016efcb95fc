"""Two-PROCESS (not just two-device) distributed test (VERDICT r2 #7).

The 8-virtual-device dryrun shares one process; this spawns two coordinated
``jax.distributed`` processes (4 CPU devices each) and runs a sharded train
step plus a short generate across the process boundary — the reference never
tests its multi-node path at all (SURVEY.md §4: "no distributed/multi-node
tests").
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_distributed_worker.py"
REPO = Path(__file__).parent.parent


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_and_generate():
    coord = f"127.0.0.1:{free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in: {out[-500:]}"
        results.append(lines[0])
    # loss and greedy tokens must be bit-identical across processes
    assert results[0] == results[1], results
