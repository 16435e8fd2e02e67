"""Multi-host (DCN-analogue) data parallelism: 2 processes x 4 virtual CPU
devices each, joined via jax.distributed.initialize, one sharded two-phase
train step through shard_batch's make_array_from_process_local_data branch
(parallel/mesh.py:76-78). Replaces/regresses the reference's multi-GPU
capability (main_DataParallel.py:609) at the process-spanning level its dead
DDP imports only gestured at (my_trainer.py:12-13,27)."""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
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
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=\d+ lossE=([\d.eE+-]+) lossD=([\d.eE+-]+)", out)
        assert m, out[-4000:]
        losses.append((float(m.group(1)), float(m.group(2))))
    # both processes run the same global program -> identical losses
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
