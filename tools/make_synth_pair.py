"""Generate the bundled synthetic ground-truth stereo pair (data/synth).

The reference fetches Middlebury GT at runtime (download_stereo.m:116-117) —
impossible here (zero egress), and the snapshot ships only im2/im6.  This
scene makes the bad-pixel metric (BASELINE metric 1, SURVEY §4e) measurable
end-to-end: the true disparity is known *by construction*.

Scene: piecewise-planar (exactly the model class — 3D plane labels):
  - background slanted plane   d = 3 + 5*(x-1)/(W-1) + 2*(y-1)/(H-1)
  - foreground tilted slab     d = 12 + 3*(x-x0)/(W-1) - 1.5*(y-y0)/(H-1)
    over the rectangle x in [x0, x1), y in [y0, y1)   (1-based, fg in front)
GT is quantized to 1/FACTOR px so disp2.png (uint8, FACTOR*d, 0 = unknown)
stores it exactly.  The views satisfy the repo's matching convention
(ops/ncc warp, dispmap_ncc.m:146-153): im2(x, y) = T(x - d(x, y)),
im6(x, y) = T(x), where T is a smooth random texture on a canvas wide
enough that no left-border pixel samples outside it.

Run: python tools/make_synth_pair.py   (writes data/synth/{im2,im6,disp2}.png)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 160, 224
FACTOR = 8
PAD = 24  # canvas margin >= max disparity

# 1-based coordinates (geometry.grid_points convention)
xs = np.arange(1, W + 1, dtype=np.float64)[None, :] * np.ones((H, 1))
ys = np.arange(1, H + 1, dtype=np.float64)[:, None] * np.ones((1, W))

# plane coefficients (a, b, c, d): disparity = -(a*x + b*y + d)/c
BG = (5.0 / (W - 1), 2.0 / (H - 1), -1.0,
      3.0 - 5.0 / (W - 1) - 2.0 / (H - 1))
X0, X1, Y0, Y1 = 64, 152, 44, 122
FG = (3.0 / (W - 1), -1.5 / (H - 1), -1.0,
      12.0 - 3.0 * X0 / (W - 1) + 1.5 * Y0 / (H - 1))


def plane_disp(p):
    a, b, c, d = p
    return -(a * xs + b * ys + d) / c


def true_disparity():
    d = plane_disp(BG)
    in_fg = (xs >= X0) & (xs < X1) & (ys >= Y0) & (ys < Y1)
    d = np.where(in_fg, plane_disp(FG), d)
    # quantize so the uint8 GT PNG is exact
    return np.round(d * FACTOR) / FACTOR


def texture(rng, h, w):
    """Smooth multi-scale random RGB texture in [0, 255]."""
    out = np.zeros((h, w, 3))
    for scale, amp in ((16, 1.0), (4, 0.6), (1, 0.25)):
        hs, ws = -(-h // scale), -(-w // scale)
        coarse = rng.standard_normal((hs + 1, ws + 1, 3))
        yy = np.arange(h) / scale
        xx = np.arange(w) / scale
        y0 = np.floor(yy).astype(int)
        x0 = np.floor(xx).astype(int)
        fy = (yy - y0)[:, None, None]
        fx = (xx - x0)[None, :, None]
        c00 = coarse[y0][:, x0]
        c01 = coarse[y0][:, x0 + 1]
        c10 = coarse[y0 + 1][:, x0]
        c11 = coarse[y0 + 1][:, x0 + 1]
        out += amp * ((1 - fy) * ((1 - fx) * c00 + fx * c01)
                      + fy * ((1 - fx) * c10 + fx * c11))
    out -= out.min()
    out *= 255.0 / out.max()
    return out


def sample_rows(T, xq):
    """Bilinear sample T [H, Wc, 3] at per-pixel column coords xq [H, W]."""
    x0 = np.floor(xq).astype(int)
    f = (xq - x0)[..., None]
    rows = np.arange(T.shape[0])[:, None]
    return (1 - f) * T[rows, x0] + f * T[rows, x0 + 1]


def main():
    rng = np.random.default_rng(20260821)
    d = true_disparity()
    T = texture(rng, H, W + PAD + 2)  # canvas coords u = x + PAD (1-based x)
    u = xs - 1 + PAD  # im6(x) = T(u)
    im6 = sample_rows(T, u)
    im2 = sample_rows(T, u - d)  # im2(x) = T(x - d) = im6 at x - d
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "synth")
    os.makedirs(out, exist_ok=True)
    from PIL import Image

    Image.fromarray(np.clip(im2, 0, 255).astype(np.uint8)).save(
        os.path.join(out, "im2.png"))
    Image.fromarray(np.clip(im6, 0, 255).astype(np.uint8)).save(
        os.path.join(out, "im6.png"))
    gt_raw = np.round(d * FACTOR).astype(np.uint8)
    assert gt_raw.max() < 256 and gt_raw.min() > 0
    Image.fromarray(gt_raw, mode="L").save(os.path.join(out, "disp2.png"))
    print(f"wrote data/synth: H={H} W={W} d in [{d.min():.2f}, {d.max():.2f}]"
          f" factor={FACTOR}")
    print("bg plane:", BG, "\nfg plane:", FG, f"rect x[{X0},{X1}) y[{Y0},{Y1})")


if __name__ == "__main__":
    main()
