"""Multi-host (DCN-style) runtime exercised on a REAL 2-process CPU cluster.

The reference has no distributed backend at all (SURVEY §2.3); the TPU runtime
replaces it with jax.distributed + a global device mesh. Round-2 coverage of
``parallel.init_distributed`` was call-order mocks only; here two actual
processes (4 virtual CPU devices each) form one 8-device cluster over a gRPC
coordinator with Gloo collectives — the same multi-controller code path a real
multi-host TPU pod runs over DCN, minus the transport. Each worker builds the
repo's (data=4, model=2) mesh spanning BOTH processes, runs a cross-process
reduction, and takes one data+tensor-parallel gradient step through
``param_shardings``/``batch_sharding``; the parent checks both workers agree
and match a closed-form numpy gradient.
"""
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_REPO = Path(__file__).resolve().parents[1]

_WORKER = r"""
import os, sys
pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# The container's sitecustomize force-registers the axon TPU plugin when these
# are set; a CPU cluster worker must never load it (see __graft_entry__).
for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
          "JAX_PLATFORM_NAME", "PJRT_DEVICE", "TPU_LIBRARY_PATH"):
    os.environ.pop(k, None)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])
from future_urban_scene_generation_tpu.parallel import mesh as pmesh
# Contract under test: initialize BEFORE any backend query (mesh.py docstring).
pmesh.init_distributed(coordinator_address=coord, num_processes=nproc,
                       process_id=pid, local_device_ids=list(range(4)))
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 4 * nproc
mesh = pmesh.make_mesh(data=-1, model=2)
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "model": 2}

# 1) Cross-process reduction: global array assembled from per-process shards.
gshape = (8, 16)
base = np.arange(np.prod(gshape), dtype=np.float32).reshape(gshape)
x = jax.make_array_from_callback(gshape, pmesh.batch_sharding(mesh),
                                 lambda idx: base[idx])
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=pmesh.replicated(mesh))(x)
assert float(total) == float(base.sum())

# 2) One dp+tp gradient: batch over 'data', weight columns over 'model'.
N, D = 8, 64
Xh = (np.arange(N * D, dtype=np.float32).reshape(N, D) % 7.0) / 7.0 - 0.4
Wh = np.eye(D, dtype=np.float32) + 0.01
params = {"w": jnp.asarray(Wh)}
p_sh = pmesh.param_shardings(params, mesh)
assert p_sh["w"].spec == P(None, "model")  # tensor-parallel columns
params = pmesh.shard_params(params, mesh)
Xd = jax.make_array_from_callback((N, D), pmesh.batch_sharding(mesh),
                                  lambda idx: Xh[idx])

def loss(p, x):
    y = x @ p["w"]
    return jnp.mean(y * y)

val, grad = jax.jit(jax.value_and_grad(loss),
                    out_shardings=(pmesh.replicated(mesh),
                                   {"w": pmesh.replicated(mesh)}))(params, Xd)
print(f"RESULT loss={float(val):.8f} gsum={float(jnp.abs(grad['w']).sum()):.6f}",
      flush=True)
print(f"proc {pid}: OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", coord, str(_REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = []
    for out in outs:
        m = re.search(r"RESULT loss=([\d.]+) gsum=([\d.]+)", out)
        assert m, out[-3000:]
        results.append((float(m.group(1)), float(m.group(2))))
    # Multi-controller: every process computes the same replicated results.
    assert results[0] == results[1]

    # Closed form: loss = mean((XW)^2); dL/dW = 2/(N*M) X^T (XW).
    N, D = 8, 64
    X = (np.arange(N * D, dtype=np.float64).reshape(N, D) % 7.0) / 7.0 - 0.4
    W = np.eye(D) + 0.01
    Y = X @ W
    ref_loss = float((Y * Y).mean())
    ref_gsum = float(np.abs(2.0 / (N * D) * X.T @ Y).sum())
    assert results[0][0] == pytest.approx(ref_loss, rel=1e-4)
    assert results[0][1] == pytest.approx(ref_gsum, rel=1e-4)
