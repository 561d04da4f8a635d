"""Two-process multi-host validation driver.

Usage: run_pair.py <process_id> <num_processes> <coordinator>
Each process forces the CPU backend with 4 virtual devices; process 0 prints
the result line 'MULTIHOST <energy> <lb> <iters> <labels_checksum>'.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stereo_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coord, nproc, pid)
assert len(jax.devices()) == 4 * nproc, jax.devices()

import oracles  # noqa: E402

rng = np.random.default_rng(0)
H, W, K = 16, 32, 5
theta, D0, Q, alphas = oracles.grid_trws_inputs(rng, H, W, K)
theta = theta.astype(np.float32)
D0 = D0.astype(np.float32)
Q = Q.astype(np.float32)
alphas = alphas.astype(np.float32)

mesh = multihost.global_mesh(batch=1)
res = multihost.sharded_solve_global(
    mesh, theta, D0, Q, alphas, kernel=1, tol=1.0, maxiter=8, max_relgap=0.0,
)
e = float(res.energy)
lb = float(res.lower_bound)
it = int(res.iterations)
labels = np.asarray(res.labels)
checksum = int(labels.astype(np.int64).sum())
if pid == 0:
    print(f"MULTIHOST {e:.6f} {lb:.6f} {it} {checksum}", flush=True)
