"""Multi-host (multi-process) runtime actually exercised: two local CPU
processes join via parallel/distributed.initialize_distributed (Gloo), build
a GLOBAL mesh spanning both processes' devices, and run a cross-process
collective — upgrading the §2.4 multi-node story from 'thin wrapper' to a
tested path.  (The reference is strictly single-process; on real pods the
same code takes coordinator/process info from the TPU metadata service.)
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys, os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
from openglottal_tpu.parallel.distributed import (initialize_distributed,
                                                  is_primary, process_index)

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
assert initialize_distributed(f"localhost:{port}", n, pid)
assert (process_index() == pid) and (is_primary() == (pid == 0))
assert jax.process_count() == n and len(jax.devices()) == n  # global view

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

from openglottal_tpu.parallel.mesh import make_mesh

# cross-process allgather sees every process
g = multihost_utils.process_allgather(jnp.asarray([process_index()]))
assert sorted(np.ravel(g).tolist()) == list(range(n)), g

# a mesh built the ordinary way spans the GLOBAL device set; a psum over
# 'data' crosses the process boundary (Gloo collective inserted by XLA)
mesh = make_mesh(n_data=n)
local = jnp.ones((1, 4), jnp.float32) * (pid + 1)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), (n, 4))
total = jax.jit(
    lambda x: x.sum(),  # GSPMD inserts the cross-process all-reduce
    out_shardings=NamedSharding(mesh, P()))(garr)
expect = 4.0 * sum(range(1, n + 1))
assert float(jax.device_get(total)) == expect, (float(total), expect)
print(f"OK proc {pid}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("OPENGLOTTAL_SKIP_SUBPROC") == "1",
                    reason="subprocess tests disabled")
def test_two_process_runtime(tmp_path):
    w = tmp_path / "worker.py"
    w.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # workers must not inherit the suite's 8-virtual-device flag: one CPU
    # device per process keeps the global view at exactly n devices
    procs = [subprocess.Popen(
        [sys.executable, str(w), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out.decode())
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK proc {i}" in out
