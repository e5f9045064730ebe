"""Multi-process smoke test for parallel/multihost.py.

Launches TWO OS processes that jax.distributed.initialize against a local
coordinator (CPU backend, 2 virtual devices each -> 4 global devices), build
the global particle mesh, and run a tiny tempered SMC with cross-process
collectives. This validates the launcher glue the reference has no analog
for (SURVEY.md §5 "Distributed communication backend") without TPU pod
hardware — the same initialize/mesh/run_smc path scales to a pod slice.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import numpy as np
coordinator, pid = sys.argv[1], int(sys.argv[2])
import jax
from smcnuts_tpu.parallel.multihost import initialize
process_id, process_count = initialize(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
assert process_count == 2, process_count
assert jax.device_count() == 4, jax.device_count()  # 2 local x 2 processes
assert jax.local_device_count() == 2

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import make_gaussian
from smcnuts_tpu.parallel import particle_mesh

model = make_gaussian(np.array([1.0, -2.0]), np.array([0.5, 2.0]))
cfg = SMCConfig(n_particles=32, n_iterations=2, step_size=0.5,
                tempering=True, save_history=False, max_tree_depth=4)
mesh = particle_mesh()  # spans all 4 global devices
res = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(jax.random.key(0))
mean = np.asarray(res.mean_estimate)  # all-gather of the distributed result
assert np.all(np.isfinite(mean)), mean
print(f"proc {process_id}/{process_count} OK mean={mean[-1]}")
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Force the CPU backend in the children (the env pins JAX_PLATFORMS=axon
    # via sitecustomize; clearing PYTHONPATH/PALLAS_AXON_POOL_IPS disables it
    # — same recipe as conftest.py, but cross-process).
    env.update(
        PYTHONPATH=repo,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed smoke timed out; partial output: {outs}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "proc 0/2 OK" in outs[0]
    assert "proc 1/2 OK" in outs[1]
