"""Multi-host mesh story (parallel/distributed.py).

The 2-process test runs a real jax.distributed CPU fleet (Gloo
collectives) in subprocesses — each with 4 virtual devices — and checks
stream locality plus a cross-process reduction. In-process tests cover
the single-process fallbacks.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from chessboard_vision_tpu.parallel import distributed as dist
from chessboard_vision_tpu.parallel.mesh import make_mesh


def test_global_mesh_single_process():
    # In the test env this is the 8-virtual-device, 1-process "fleet".
    mesh = dist.global_stream_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_distribute_local_streams_single_process(rng):
    mesh = make_mesh(8, ("data",))
    local = rng.normal(size=(8, 3, 4, 4)).astype(np.float32)
    g = dist.distribute_local_streams(mesh, local)
    assert g.shape == (8, 3, 4, 4)
    np.testing.assert_array_equal(np.asarray(g), local)


@pytest.mark.slow
def test_two_process_fleet():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK proc={i}" in out


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
