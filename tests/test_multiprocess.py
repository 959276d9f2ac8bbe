"""Multi-process distributed smoke test.

Analog of the reference's self-spawned `mpiexec -n 2` test (test/mpi.jl:4-12):
spawns two local processes that join a jax.distributed cluster (CPU backend,
2 virtual devices each => a 4-device global mesh), run the same sharded
:vegas integration, and must both produce the identical, accurate Result —
exercising the global-mesh shard_map + psum + process_allgather path end to
end without real multi-host hardware.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.environ["MCI_REPO"])
from mcintegration_tpu import Continuous, integrate
from mcintegration_tpu.parallel.mesh import make_mesh

assert len(jax.devices()) == 4, jax.devices()
mesh = make_mesh()
res = integrate(lambda x, c: jnp.where(x[0]**2 + x[1]**2 < 1.0, 1.0, 0.0),
                var=Continuous(0.0, 1.0), dof=[[2]], neval=4e4, niter=3,
                block=8, solver="vegas", mesh=mesh, verbose=-2, seed=99)
m = float(np.asarray(res.mean[0]))
e = float(np.asarray(res.stdev[0]))
print(f"RESULT {pid} {m:.10f} {e:.10f}", flush=True)
assert abs(m - np.pi / 4) < 7 * max(e, 1e-12), (m, e)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["MCI_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    vals = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        vals.append(tuple(float(x) for x in line.split()[2:]))
    # every process returns the identical Result (no root/worker asymmetry)
    assert vals[0] == vals[1], vals
