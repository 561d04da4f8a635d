"""Second-order scalar-disparity stereo (the ojw_stereo pipeline core).

Runs the SecondOrderStereo model — scalar disparity per pixel, triple-clique
truncated second-derivative prior, QPBO fusion with cubic reduction — through
the ojw_stereo_optim-style proposal schedule on a crop of a bundled pair.
(The full-resolution scalar pipeline with visibility is roadmapped; fusion
here solves on the native host QPBO, so a crop keeps runtime interactive.)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from stereo_tpu.config import CVPR08Options
from stereo_tpu.models.second_order import SecondOrderStereo
from stereo_tpu.utils import io, viz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="teddy")
    ap.add_argument("--crop", type=int, nargs=4, default=[120, 240, 100, 280],
                    metavar=("Y0", "Y1", "X0", "X1"))
    ap.add_argument("--max-disp", type=int, default=14)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out", default="/tmp/second_order_disp.png")
    args = ap.parse_args()

    pair = io.load_pair(args.pair)
    y0, y1, x0, x1 = args.crop
    crop = lambda im: im[y0:y1, x0:x1]
    P = pair.P.copy()
    P[1, 0, 3] = -0.25  # quarter-pixel shift per disparity unit (teddy)

    t0 = time.perf_counter()
    dm = SecondOrderStereo(
        [crop(pair.images[0]), crop(pair.images[1])], P,
        (0, args.max_disp), 1, CVPR08Options(), seed=0,
    )
    print(f"setup: {time.perf_counter()-t0:.1f}s; initial E = {dm.energy():.6g}")

    t0 = time.perf_counter()
    energies = dm.optimize(
        schedule=("sweep_ftb", "smooth", "fronto", "random"),
        max_iters=args.iters, verbose=True,
    )
    dt = time.perf_counter() - t0
    print(f"final E = {energies[-1]:.6g} after {len(energies)-1} fusions "
          f"({dt:.1f}s, {(len(energies)-1)/dt:.2f} moves/s)")
    viz.save_dispmap(args.out, np.asarray(dm.disp), energy=energies[-1])
    print("disparity render:", args.out)


if __name__ == "__main__":
    main()
