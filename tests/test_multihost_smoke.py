"""Real 2-process multihost smoke test (round-2 verdict #7).

Launches two worker processes that jax.distributed.initialize against a
local coordinator (CPU backend, 4 virtual devices each -> 8 global), build
the DCN-friendly mesh, and run one REAL data-parallel SSD3D train step with
each process feeding only its process_batch_slice rows. Both workers' global
loss must agree with the single-process 8-device value.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_workers():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    procs, outs = _launch_workers()
    if any(p.returncode != 0 for p in procs) and any(
        "DEADLINE_EXCEEDED" in o for o in outs
    ):
        # Gloo's communicator rendezvous has a fixed 30 s key-value timeout;
        # on a 1-core host the OS can schedule the two workers' jax imports /
        # compiles back-to-back and blow past it. That is host-scheduling
        # flakiness, not a framework defect (the worker already warms the
        # communicator with an early barrier) — retry once on this exact
        # signature only.
        procs, outs = _launch_workers()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS")]
        assert lines, out
        losses.append(float(lines[0].split()[1]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # single-process reference value on the in-process 8-device CPU mesh
    from mslesions3d_tpu.parallel import make_mesh
    from tests.multihost_worker import make_setup, run_step

    cfg, batch = make_setup()
    single = run_step(cfg, batch, make_mesh(8), multihost=False)
    np.testing.assert_allclose(losses[0], single, rtol=1e-4)
