"""2-process distributed runtime test (VERDICT r1 item 6).

Spawns two real OS processes, each a separate JAX "host" with 4 virtual
CPU devices, connected by `initialize_runtime` (jax.distributed + gloo
collectives). The distributed Schur BA then runs over the 8-device
("seq"=1, "map"=8) GLOBAL mesh — its psum crosses the process boundary —
and each process checks the result against the single-device solver it
computes locally. This is the cross-host analog of
tests/test_distributed.py, exercising the actual multi-host entry path
a TPU pod would use (SURVEY.md §2.4 communication backend row).

Marked slow: each worker pays its own JAX startup (~20 s).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import numpy as np

pid = int(sys.argv[1])

from visualodometry_tpu.parallel.runtime import (
    initialize_runtime,
    shutdown_runtime,
)

spec = initialize_runtime(
    coordinator_address="127.0.0.1:%PORT%",
    num_processes=2,
    process_id=pid,
    cpu_devices_per_process=4,
)
assert spec.num_processes == 2, spec
assert spec.global_devices == 8, spec
assert spec.local_devices == 4, spec

import jax
import jax.numpy as jnp
import cv2

from visualodometry_tpu.ba import BAProblem, ba_solve
from visualodometry_tpu.parallel import ba_solve_distributed, make_mesh

K = np.array(
    [[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]],
    dtype=np.float32,
)
rng = np.random.default_rng(42)
P_kf, L = 5, 256
X = np.stack(
    [rng.uniform(-15, 15, L), rng.uniform(-4, 3, L), rng.uniform(10, 50, L)],
    axis=1,
).astype(np.float32)
T_cw, uv = [], np.zeros((L, P_kf, 2), np.float32)
for p in range(P_kf):
    w = np.array([0.0, 0.002 * p, 0.0])
    t = np.array([0.05 * p, 0.0, -1.2 * p])
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = cv2.Rodrigues(w)[0]
    T[:3, 3] = t
    T_cw.append(T)
    proj, _ = cv2.projectPoints(
        X.astype(np.float64), w, t, K.astype(np.float64), None
    )
    uv[:, p] = proj.reshape(-1, 2)
uv += rng.normal(0, 0.2, uv.shape).astype(np.float32)
prob = BAProblem(
    T_cw=jnp.asarray(np.stack(T_cw)),
    X=jnp.asarray(X + rng.normal(0, 0.3, X.shape).astype(np.float32)),
    uv=jnp.asarray(uv),
    mask=jnp.ones((L, P_kf), bool),
    K=jnp.asarray(K),
)

mesh = make_mesh(num_seq=1, num_map=8)  # spans both processes
dist = ba_solve_distributed(prob, mesh, iters=6, damping=1e-4)
ref = ba_solve(prob, iters=6, damping=1e-4)

# every process holds the full (replicated) pose block
T_dist = np.asarray(
    jax.device_get(dist.T_cw.addressable_data(0))
)
np.testing.assert_allclose(T_dist, np.asarray(ref.T_cw), rtol=1e-4, atol=1e-4)

# landmark shards: compare this process's addressable rows
lm_shards = [
    (s.index[0].start or 0, np.asarray(s.data)) for s in dist.X.addressable_shards
]
ref_X = np.asarray(ref.X)
for start, block in lm_shards:
    np.testing.assert_allclose(
        block, ref_X[start : start + block.shape[0]], rtol=1e-3, atol=1e-3
    )

shutdown_runtime()
print(f"WORKER_OK {pid}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    import socket

    with socket.socket() as s:  # grab a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("%PORT%", str(port)))

    env = {
        k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)
    }
    env["JAX_PLATFORMS"] = ""  # workers pick cpu via initialize_runtime
    # scripts run from tmp_path; the repo isn't pip-installed
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd="/root/repo",
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
        pytest.fail("multi-process BA workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out
