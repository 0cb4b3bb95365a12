"""REAL multi-process distributed training (SURVEY §2.8 backend row).

Two OS processes, each hosting 2 virtual CPU devices, coordinate through
`jax.distributed` (Gloo collectives) exactly as TPU pod hosts would over ICI:
the trainer's `maybe_distributed_initialize` + `host_local_to_global_batch`
path runs a sharded train step on a GLOBAL 4-device mesh with each process
feeding only its local batch rows. Both processes must report the same
finite losses — this closes the round-2 "real multi-process untestable"
caveat (multi-HOST still needs hardware; multi-process is the same code
path through the distributed runtime).
"""
import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "scripts" / "mp_train_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        # two fresh processes compile the distributed train program over
        # Gloo; measured 559 s standalone on this host — 600 s flaked when
        # the rest of the slow suite shared the machine
        out, _ = p.communicate(timeout=1500)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: MP OK" in out, out

    # both processes observed 4 global devices and identical losses
    losses = []
    for out in outputs:
        assert "global=4" in out
        m = re.search(r"losses=([-\d.]+),([-\d.]+)", out)
        assert m, out
        losses.append((float(m.group(1)), float(m.group(2))))
    np.testing.assert_allclose(losses[0], losses[1], rtol=0)
    assert np.isfinite(losses[0]).all()
    # two steps actually moved the loss
    assert losses[0][0] != losses[0][1]
