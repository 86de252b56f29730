"""Multi-process multi-host bring-up (parallel/multihost.py).

``initialize_distributed`` was previously only exercised as the single-host
no-op; this spawns TWO real processes on the CPU backend with a localhost
coordinator — the same ``jax.distributed.initialize`` path a TPU pod
bootstrap takes (one process per host, coordinator on host 0) — and checks
global process/device visibility plus a cross-process allgather.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from video_depth_anything_tpu.parallel.multihost import initialize_distributed

pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
p, np_ = initialize_distributed(addr, n, pid)
assert (p, np_) == (pid, n), (p, np_)
assert jax.process_count() == n
# one CPU device per process, all globally visible
assert len(jax.devices()) == n, jax.devices()
assert len(jax.local_devices()) == 1

import jax.numpy as jnp
from jax.experimental import multihost_utils

vals = multihost_utils.process_allgather(jnp.asarray([pid], jnp.int32))
got = sorted(int(v) for v in vals.ravel())
assert got == list(range(n)), got
print("WORKER_OK", pid, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_initialize_distributed_two_process_cpu():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # one device per process — the workers assert global visibility of 2
    env.pop("XLA_FLAGS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), "2", addr],
            env=env,
            cwd=root,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
