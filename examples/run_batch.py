"""Multi-pair batched simultaneous fusion over a device mesh.

The "high-res multi-pair batch" configuration (BASELINE.json configs[4]):
several same-shaped stereo problems fused in ONE jit over a ('batch', 'x')
mesh — stereo pairs data-parallel over 'batch', the pixel grid spatially
partitioned over 'x' with XLA-inserted halo exchanges.

On a single real chip this runs with a (1, 1) mesh; on a virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8) it
demonstrates the full multi-device path.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from stereo_tpu import geometry
from stereo_tpu.models.ncc import DispMapNCC
from stereo_tpu.parallel import batch as batch_mod, mesh as mesh_mod
from stereo_tpu.utils import io


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", nargs="+", default=["teddy", "teddy"])
    ap.add_argument("--max-disp", type=int, default=30)
    ap.add_argument("--maxiter", type=int, default=200)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    batch = args.batch or (len(args.pairs) if n_dev % len(args.pairs) == 0 else 1)
    mesh = mesh_mod.make_mesh(n_dev, batch=batch)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    disparities = np.arange(0, args.max_disp + 1)
    models = []
    for name in args.pairs:
        pair = io.load_pair(name, dtype=np.float32)
        models.append(DispMapNCC(pair.images, disparities, kernel=1,
                                 unary_weight=40.0, tol=8.0))
    H, W = models[0].sz
    props = [
        [geometry.fronto_parallel(H, W, float(d), m.dtype)
         for d in range(0, args.max_disp + 1, 6)]
        for m in models
    ]

    t0 = time.perf_counter()
    out = batch_mod.simultaneous_fusion_batched(
        models, props, mesh, maxiter=args.maxiter, max_relgap=1e-4,
    )
    dt = time.perf_counter() - t0
    for name, (e, lb, it) in zip(args.pairs, out):
        print(f"{name}: E = {e:.6g}, lb = {lb:.6g}, iters = {it}")
    npx = len(models) * H * W
    print(f"batched fusion: {dt:.2f}s for {len(models)} pairs "
          f"({npx * out[0][2] / dt / 1e6:.1f} Mpixel-iters/s)")


if __name__ == "__main__":
    main()
