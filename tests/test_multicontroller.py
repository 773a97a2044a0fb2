"""True multi-controller smoke test (VERDICT r4 next-round #6).

``tests/test_parallel.py`` and ``dryrun_multichip`` exercise 8 virtual devices
in ONE process; this test spawns TWO separate ``jax.distributed.initialize``
CPU processes (4 virtual devices each) and runs the sharded train step plus
the observation-sharded BA solve across the process boundary — the exact code
path a multi-host TPU pod depends on (``macvo_tpu/parallel/mesh.py``
``init_distributed``; SURVEY.md §4 multi-host recommendation).
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multicontroller_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multicontroller():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(WORKER.parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}\n{out[-4000:]}"
        assert "MULTICONTROLLER OK" in out, f"worker {i} incomplete\n{out[-4000:]}"
