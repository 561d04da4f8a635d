"""Image segmentation for smoothness weights and SegPln proposals.

Two backends mirroring the reference's pair (dispmap_globalstereo.m:121-134):

- ``felzenszwalb``: graph-based segmentation, entirely in the native C++
  runtime (the vgg_segment_gb equivalent).
- ``mean_shift``: EDISON-style mean-shift segmentation (the vgg_segment_ms
  equivalent): the *filtering* stage — iterating every pixel's (x, y, L, u, v)
  feature to its mode under uniform kernels — runs on device as a windowed
  vectorized jax program; the merge stage (mode connection, transitive region
  fusion, small-region pruning) is host-side union-find in the native library.

Behavioral (not bitwise) parity with EDISON: the reference calls
Segment(..., HIGH_SPEEDUP) (vgg_segment_ms.cxx:74), an approximation layer of
the original code; segment *boundaries* are what feed the pipeline (weights,
per-segment plane fits), and these agree to the bandwidth scale.
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np
import jax
import jax.numpy as jnp

from stereo_tpu import native


# --------------------------------------------------------------------- LUV

_RGB2XYZ = np.array(
    [
        [0.4125, 0.3576, 0.1804],
        [0.2125, 0.7154, 0.0721],
        [0.0193, 0.1192, 0.9502],
    ],
    dtype=np.float64,
)
_XN, _YN, _ZN = 0.9505, 1.0, 1.0888
_UN = 4.0 * _XN / (_XN + 15.0 * _YN + 3.0 * _ZN)
_VN = 9.0 * _YN / (_XN + 15.0 * _YN + 3.0 * _ZN)


def rgb_to_luv(im: jax.Array) -> jax.Array:
    """[H, W, 3] RGB in [0, 255] -> CIE LUV (EDISON's conversion constants)."""
    rgb = im / 255.0
    xyz = jnp.einsum("hwc,dc->hwd", rgb, jnp.asarray(_RGB2XYZ, im.dtype))
    X, Y, Z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    y_ratio = Y / _YN
    L = jnp.where(
        y_ratio > 0.008856,
        116.0 * jnp.cbrt(y_ratio) - 16.0,
        903.3 * y_ratio,
    )
    denom = X + 15.0 * Y + 3.0 * Z
    denom = jnp.where(denom == 0, 1.0, denom)
    u_p = 4.0 * X / denom
    v_p = 9.0 * Y / denom
    u = 13.0 * L * (u_p - _UN)
    v = 13.0 * L * (v_p - _VN)
    return jnp.stack([L, u, v], axis=-1)


# ---------------------------------------------------------- mean-shift filter


@functools.partial(jax.jit, static_argnames=("h_s", "max_iters"))
def mean_shift_filter(
    luv: jax.Array,  # [H, W, 3]
    h_s: int,
    h_r: float,
    max_iters: int = 20,
    eps: float = 0.01,
) -> jax.Array:
    """Filter each pixel's joint feature (x, y, L, u, v) to its mode.

    Uniform kernels: the window is all pixels within [-h_s, h_s]^2 of the
    *current spatial position* whose LUV distance to the current range value
    is below h_r.  Static window size; positions are tracked continuously and
    the neighborhood is gathered around the rounded position each step.
    """
    H, W, _ = luv.shape
    dtype = luv.dtype
    ys0 = jnp.arange(H, dtype=dtype)[:, None] * jnp.ones((1, W), dtype)
    xs0 = jnp.ones((H, 1), dtype) * jnp.arange(W, dtype=dtype)[None, :]

    # neighborhood offsets (static)
    offs = [(dy, dx) for dy in range(-h_s, h_s + 1) for dx in range(-h_s, h_s + 1)]
    offs_np = np.array(offs, dtype=np.int32)  # [M, 2]
    M = len(offs)
    r2 = h_r * h_r
    s2 = float(h_s) * float(h_s)

    def step(state):
        it, pos_y, pos_x, val, shift = state
        cy = jnp.clip(jnp.round(pos_y).astype(jnp.int32), 0, H - 1)
        cx = jnp.clip(jnp.round(pos_x).astype(jnp.int32), 0, W - 1)

        acc_y = jnp.zeros((H, W), dtype)
        acc_x = jnp.zeros((H, W), dtype)
        acc_v = jnp.zeros((H, W, 3), dtype)
        acc_n = jnp.zeros((H, W), dtype)
        for m in range(M):
            dy, dx = int(offs_np[m, 0]), int(offs_np[m, 1])
            ny = cy + dy
            nx = cx + dx
            inb = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
            nyc = jnp.clip(ny, 0, H - 1)
            nxc = jnp.clip(nx, 0, W - 1)
            nval = luv[nyc, nxc]  # [H, W, 3]
            nyf = nyc.astype(dtype)
            nxf = nxc.astype(dtype)
            dsp = (nyf - pos_y) ** 2 + (nxf - pos_x) ** 2
            dr = jnp.sum((nval - val) ** 2, axis=-1)
            w = (inb & (dsp <= s2) & (dr <= r2)).astype(dtype)
            acc_y = acc_y + w * nyf
            acc_x = acc_x + w * nxf
            acc_v = acc_v + w[..., None] * nval
            acc_n = acc_n + w
        n = jnp.maximum(acc_n, 1.0)
        new_y = acc_y / n
        new_x = acc_x / n
        new_v = acc_v / n[..., None]
        shift = (
            (new_y - pos_y) ** 2
            + (new_x - pos_x) ** 2
            + jnp.sum((new_v - val) ** 2, axis=-1)
        )
        return it + 1, new_y, new_x, new_v, shift

    def cond(state):
        it, _, _, _, shift = state
        return jnp.logical_and(it < max_iters, jnp.max(shift) > eps * eps)

    init = (jnp.zeros((), jnp.int32), ys0, xs0, luv,
            jnp.full((H, W), jnp.inf, dtype))
    _, _, _, val, _ = jax.lax.while_loop(cond, step, init)
    return val


# ------------------------------------------------------------ public wrappers


def mean_shift(im_rgb, h_s: int, h_r: float, min_region: int,
               max_iters: int = 20) -> np.ndarray:
    """EDISON-style segmentation -> uint32 labels [H, W], 1-based.

    The vgg_segment_ms(A, h_s, h_r, min_sz) equivalent.
    """
    im = jnp.asarray(np.asarray(im_rgb), jnp.float32)
    luv = rgb_to_luv(im)
    modes = np.asarray(mean_shift_filter(luv, int(h_s), float(h_r),
                                         max_iters), dtype=np.float32)
    H, W, _ = modes.shape
    labels = np.zeros((H, W), dtype=np.uint32)
    L = native.lib()
    L.connect_modes(
        np.ascontiguousarray(modes).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        H, W, ctypes.c_float(float(h_r)), int(min_region),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return labels


def felzenszwalb(im_rgb, sigma: float, k: float, min_size: int) -> np.ndarray:
    """Graph-based segmentation -> uint32 labels [H, W], 1-based.

    The vgg_segment_gb(A, sigma, k, min_sz, 1) equivalent.
    """
    im = np.ascontiguousarray(np.asarray(im_rgb), dtype=np.float32)
    H, W = im.shape[:2]
    labels = np.zeros((H, W), dtype=np.uint32)
    L = native.lib()
    L.felzenszwalb(
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, ctypes.c_float(float(sigma)), ctypes.c_float(float(k)),
        int(min_size),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return labels
