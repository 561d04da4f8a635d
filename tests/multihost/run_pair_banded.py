"""Two-process multi-host validation of the distributed banded solver.

Usage: run_pair_banded.py <process_id> <num_processes> <coordinator>
Each process forces the CPU backend with 4 virtual devices (gy stripes span
both processes, so the per-step seam ppermutes cross the process boundary);
process 0 prints 'MULTIHOST_BANDED <energy> <lb> <labels_checksum>'.
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
labels, e, lb = multihost.sharded_banded_global(
    theta.astype(np.float32), D0.astype(np.float32), Q.astype(np.float32),
    alphas.astype(np.float32), kernel=1, tol=1.0, Bh=2, Bw=4, sweeps=4,
    decode_every=2)
checksum = int(np.asarray(labels).astype(np.int64).sum())
if pid == 0:
    print(f"MULTIHOST_BANDED {e:.6f} {lb:.6f} {checksum}", flush=True)
