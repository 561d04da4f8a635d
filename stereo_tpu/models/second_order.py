"""Second-order scalar-disparity stereo — the ojw_stereo pipeline core.

The reference bundles (but its examples never call) Woodford's full CVPR'08
scalar-disparity stereo: a disparity value per pixel, a *triple-clique*
second-order smoothness prior over 3 consecutive pixels per row/column
(ojw_stereo.m:76-94 builds the clique index set; ibr_fuse_depths.m:166-187
evaluates the truncated second derivative for all 8 cur/proposal corner
combinations), optimized by QPBO fusion with the triple tables reduced to
pairwise + auxiliary nodes (vgg_qpbo.cxx:209-256).

This model reproduces that core:

    E(d) = sum_p sum_views U_{p,a}(d_p)   [or the visibility model below]
         + sum_{triples (p-,p,p+)} w_t * min(|d_{p-} - 2 d_p + d_{p+}|, tau)

with U the Woodford photoconsistency unary (ops/photo) on the scalar field's
fronto-parallel planes, summed over input views, and w_t the
segmentation-modulated weights of the center pixel's in-edges.  With
``options.visibility`` (the reference default), the per-view photo costs move
from the unary into the geometric visibility model of models/visibility:
each (pixel, surface, view) sample either pays its photo cost or the
occlusion cost occl_const + log 2, with Kinf edges forbidding visibility
where a selected nearer surface projects on top (ibr_fuse_depths.m:57-139).
Unary/curvature/projection maps evaluate on device; fusion moves solve on
the native QPBO through the cubic reduction (host) — the device/tensor split
mirrors the reference's MATLAB/mex boundary, now with an exact, tested
solver underneath.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from stereo_tpu import geometry
from stereo_tpu.config import CVPR08Options
from stereo_tpu.ops import photo
from stereo_tpu.solvers import qpbo_host


def curvature_map(disp: jax.Array, axis: int) -> jax.Array:
    """|d_{p-} - 2 d_p + d_{p+}| along rows (axis=1) or columns (axis=0);
    zero where the triple leaves the image."""
    H, W = disp.shape
    z = jnp.zeros_like(disp)
    if axis == 1:
        inner = jnp.abs(disp[:, :-2] - 2.0 * disp[:, 1:-1] + disp[:, 2:])
        return z.at[:, 1:-1].set(inner)
    inner = jnp.abs(disp[:-2, :] - 2.0 * disp[1:-1, :] + disp[2:, :])
    return z.at[1:-1, :].set(inner)


class SecondOrderStereo:
    """Scalar-disparity model with the triple-clique curvature prior."""

    def __init__(self, images, P, disp_range, disparity_factor,
                 options: CVPR08Options | None = None, *, seed: int = 0):
        options = options or CVPR08Options()
        self.options = options
        self.images = [jnp.asarray(np.asarray(im), jnp.float32) for im in images]
        H, W = self.images[0].shape[:2]
        self.sz = (H, W)
        self.P = np.asarray(P, dtype=np.float64)
        disps = np.arange(disp_range[0] * disparity_factor,
                          disp_range[1] * disparity_factor + 1, dtype=np.float64)
        self.d_min = float(disps.min())
        self.d_max = float(disps.max())
        self.d_step = self.d_max - self.d_min
        self.tau = float(options.disp_thresh)  # threshold on normalized d
        # curvature weights: lambda_h inside segments (reuse the pairwise
        # weight construction on the center pixel's horizontal/vertical edges)
        from stereo_tpu.proposals import segmentation

        seg = segmentation.mean_shift(
            np.asarray(self.images[0]).astype(np.float64),
            int(options.seg_params[0]), float(options.seg_params[1]),
            int(options.seg_params[2]),
        )
        lam = np.where(
            (np.roll(seg, 1, 1) == seg) & (np.roll(seg, -1, 1) == seg),
            options.lambda_h, options.lambda_l,
        )
        lam_v = np.where(
            (np.roll(seg, 1, 0) == seg) & (np.roll(seg, -1, 0) == seg),
            options.lambda_h, options.lambda_l,
        )
        self.w_h = jnp.asarray(lam, jnp.float32)
        self.w_v = jnp.asarray(lam_v, jnp.float32)

        rng = np.random.default_rng(seed)
        self._start = rng.random((H, W)) * self.d_step + self.d_min
        self.disp = jnp.asarray(self._start, jnp.float32)

    # ------------------------------------------------------------ energy
    def unary_map(self, disp: jax.Array) -> jax.Array:
        """Photoconsistency summed over all input views (visibility off)."""
        planes = geometry.plane_field_from_disparity(disp)
        u = None
        for a in range(1, len(self.images)):
            ua = photo.unary_cost(
                planes, self.images[0], self.images[a],
                jnp.asarray(self.P[a], jnp.float32), self.options.col_thresh,
                d_min=self.d_min, d_step=max(self.d_step, 1.0),
            )
            u = ua if u is None else u + ua
        return u

    @property
    def occl_val(self) -> float:
        return self.options.occl_const + float(np.log(2.0))

    def _vis_terms(self, D1, D2):
        from stereo_tpu.models import visibility

        return visibility.build_visibility_terms(
            jnp.asarray(D1, jnp.float32), jnp.asarray(D2, jnp.float32),
            self.images[1:], self.P[1:], self.images[0],
            self.options.col_thresh, self.occl_val,
        )

    def smooth_map(self, disp: jax.Array) -> jax.Array:
        dn = (disp - self.d_min) / max(self.d_step, 1.0)
        ch = jnp.minimum(curvature_map(dn, 1), self.tau) * self.w_h
        cv = jnp.minimum(curvature_map(dn, 0), self.tau) * self.w_v
        return ch + cv

    def energy(self) -> float:
        if self.options.visibility:
            from stereo_tpu.models import visibility

            terms = self._vis_terms(self.disp, self.disp)
            e_vis, _ = visibility.calc_vis_energy(
                terms, np.zeros(terms["tp"], np.int32))
            smooth = float(np.asarray(self.smooth_map(self.disp),
                                      np.float64).sum())
            return e_vis + smooth
        return float(_scalar_energy(self))

    def _fusion_triples(self, cur_n, prop_n):
        """Triple-clique tables of a fusion pair (normalized disparities).

        Returns (triples list for the solver, blocks for vectorized energy
        evaluation): the 8-entry truncated-second-derivative tables of
        ibr_fuse_depths.m:166-187 over row and column triples."""
        H, W = self.sz
        nid = np.arange(H * W).reshape(H, W)
        w_h = np.asarray(self.w_h, np.float64)
        w_v = np.asarray(self.w_v, np.float64)
        triples = []
        blocks = []

        def add_triples(ids_a, ids_b, ids_c, w_center):
            vals = np.stack([
                np.stack([cur_n.ravel()[ids_a], prop_n.ravel()[ids_a]]),
                np.stack([cur_n.ravel()[ids_b], prop_n.ravel()[ids_b]]),
                np.stack([cur_n.ravel()[ids_c], prop_n.ravel()[ids_c]]),
            ])  # [3, 2, T]
            T = ids_a.shape[0]
            table = np.empty((2, 2, 2, T))
            for xa in range(2):
                for xb in range(2):
                    for xc in range(2):
                        d2 = np.abs(vals[0, xa] - 2 * vals[1, xb] + vals[2, xc])
                        table[xa, xb, xc] = np.minimum(d2, self.tau) * w_center
            blocks.append((ids_a, ids_b, ids_c, table))
            for t in range(T):
                triples.append((int(ids_a[t]), int(ids_b[t]), int(ids_c[t]),
                                table[:, :, :, t]))

        ids = nid[:, :-2].ravel(), nid[:, 1:-1].ravel(), nid[:, 2:].ravel()
        add_triples(*ids, w_h[:, 1:-1].ravel())
        ids = nid[:-2, :].ravel(), nid[1:-1, :].ravel(), nid[2:, :].ravel()
        add_triples(*ids, w_v[1:-1, :].ravel())
        return triples, blocks

    @staticmethod
    def _triples_energy(blocks, y):
        """Vectorized f64 energy of labeling y under the triple tables."""
        e = 0.0
        for ids_a, ids_b, ids_c, table in blocks:
            e += float(table[y[ids_a], y[ids_b], y[ids_c],
                             np.arange(len(ids_a))].sum())
        return e

    # ------------------------------------------------------------ fusion
    def _complete_labels(self, labels, regions, U0, U1, tails, heads, E,
                         triples):
        """Complete a partial QPBO labeling per ``options.improve`` — the
        reference's improve modes (ibr_fuse_depths.m:189-230):

        0: unlabelled keep current (all-zeros completion);
        1: QPBO-I from the keep-current completion (QPBOI-F);
        2: choose_labels per-region splice (QPBO-R);
        3: choose_labels all-0 vs all-1 (QPBO-L);
        4: QPBO-I seeded by the choose_labels splice (QPBOI-R, the
           callback at ibr_fuse_depths.m:195-197).
        """
        imp = int(self.options.improve)
        labels = np.asarray(labels)
        y0 = np.where(labels >= 0, labels, 0).astype(np.int32)
        if imp == 0 or (labels >= 0).all():
            return y0
        if imp in (2, 3):
            y, _ = qpbo_host.choose_labels(
                labels, regions, U0, U1, tails, heads, *E, triples=triples,
                mode=imp, independent=self.options.independent)
            return y.astype(np.int32)
        init = None
        if imp == 4:
            init, _ = qpbo_host.choose_labels(
                labels, regions, U0, U1, tails, heads, *E, triples=triples,
                mode=2, independent=self.options.independent)
        y, _ = qpbo_host.improve_with_triples(
            labels, U0, U1, tails, heads, *E, triples, init=init)
        return y.astype(np.int32)

    def fuse(self, proposal) -> float:
        """One QPBO fusion with triple cliques (and, per options.visibility,
        the geometric occlusion model); never increases energy."""
        H, W = self.sz
        tp = H * W
        cur = np.asarray(self.disp, np.float64)
        prop = np.asarray(jnp.asarray(proposal), np.float64)
        cur_n = (cur - self.d_min) / max(self.d_step, 1.0)
        prop_n = (prop - self.d_min) / max(self.d_step, 1.0)
        triples, blocks = self._fusion_triples(cur_n, prop_n)
        zeros = np.zeros(tp, np.int32)

        if self.options.visibility:
            from stereo_tpu.models import visibility

            terms = self._vis_terms(cur, prop)
            U0 = np.concatenate([terms["unary0"], terms["aux0"]])
            U1 = np.concatenate([terms["unary1"], terms["aux1"]])
            tails, heads, E00, E01, E10, E11 = terms["edges"]
            E = (E00, E01, E10, E11)
            labels, e, lb, n_unlab, regions = qpbo_host.solve_with_triples(
                U0, U1, tails, heads, *E, triples, regions=True,
            )
            y_full = self._complete_labels(labels, regions, U0, U1,
                                           tails, heads, E, triples)
            y = y_full[:tp].astype(np.int32)
            # consistent host-f64 guard with samples minimized out exactly
            e_move = (visibility.calc_vis_energy(terms, y)[0]
                      + self._triples_energy(blocks, y))
            e_keep = (visibility.calc_vis_energy(terms, zeros)[0]
                      + self._triples_energy(blocks, zeros))
            if e_move <= e_keep:
                take = (y == 1).reshape(H, W)
                self.disp = jnp.asarray(np.where(take, prop, cur), jnp.float32)
                return e_move
            return e_keep

        U0 = np.asarray(self.unary_map(self.disp), np.float64).ravel()
        U1 = np.asarray(self.unary_map(jnp.asarray(prop, jnp.float32)),
                        np.float64).ravel()
        ee = ([], [], [], [])
        labels, e, lb, n_unlab, regions = qpbo_host.solve_with_triples(
            U0, U1, [], [], *ee, triples, regions=True,
        )
        y = self._complete_labels(labels, regions, U0, U1, [], [], ee,
                                  triples)
        # Never-increase guard evaluated in ONE arithmetic: the solver's own
        # host-f64 energy of the all-zeros (keep-current) labeling, not the
        # device-f32 _scalar_energy (cross-precision disagreement could
        # otherwise accept marginally-worsening moves).
        e_cur = float(U0.sum()) + self._triples_energy(blocks, zeros)
        e_move = (float(np.where(y == 1, U1, U0).sum())
                  + self._triples_energy(blocks, y))
        if e_move <= e_cur:
            take = (y == 1).reshape(H, W)
            self.disp = jnp.asarray(np.where(take, prop, cur), jnp.float32)
        return self.energy()

    def restart(self):
        self.disp = jnp.asarray(self._start, jnp.float32)

    # --------------------------------------------------------- optimization
    def optimize(self, schedule=("fronto", "smooth", "random"),
                 max_iters: int | None = None, average_over: int | None = None,
                 converge: float | None = None, seed: int = 0,
                 verbose: bool = False) -> list[float]:
        """Proposal-schedule fusion loop (ojw_stereo_optim.m:53-146).

        Schedule entries (the reference's fronto-parallel magic codes,
        :75-105): 'random' (code 0: uniform random field), 'fronto'
        (1: random constant), 'smooth' (2: current solution averaged over
        rows/columns, alternating), 'sweep_ftb'/'sweep_btf' (3/-3: ordered
        constant sweeps), or an explicit [H, W] array.  Stops when the
        percentage energy decrease over ``average_over`` fusions drops below
        ``converge`` (:64-67: thresholds scaled by 0.01 * average_over).

        Returns the energy trace.
        """
        opts = self.options
        max_iters = max_iters if max_iters is not None else opts.max_iters
        average_over = (average_over if average_over is not None
                        else opts.average_over)
        converge_thr = (converge if converge is not None
                        else opts.converge) * 0.01 * average_over
        rng = np.random.default_rng(seed)
        H, W = self.sz
        nd = max(int(round(self.d_step)) + 1, 2)

        energies = [self.energy()]
        for it in range(max_iters):
            kind = schedule[it % len(schedule)]
            if isinstance(kind, str):
                if kind == "random":
                    Dnew = rng.random((H, W)) * self.d_step + self.d_min
                elif kind == "fronto":
                    Dnew = np.full((H, W),
                                   rng.random() * self.d_step + self.d_min)
                elif kind == "smooth":
                    dn = (np.asarray(self.disp, np.float64) - self.d_min)
                    if it % 2:
                        dn[1:-1, :] = (dn[:-2, :] + dn[2:, :]) / 2
                    else:
                        dn[:, 1:-1] = (dn[:, :-2] + dn[:, 2:]) / 2
                    Dnew = dn + self.d_min
                elif kind == "sweep_ftb":
                    f = 1.0 - (it % nd) / (nd - 1)
                    Dnew = np.full((H, W), f * self.d_step + self.d_min)
                elif kind == "sweep_btf":
                    f = (it % nd) / (nd - 1)
                    Dnew = np.full((H, W), f * self.d_step + self.d_min)
                else:
                    raise ValueError(f"unknown proposal kind {kind!r}")
            else:
                Dnew = np.asarray(kind, np.float64)
            Dnew = np.maximum(Dnew, self.d_min)
            e = self.fuse(Dnew)
            energies.append(e)
            if verbose:
                print(f"  iter {it} [{kind if isinstance(kind, str) else 'array'}]"
                      f": E = {e:.6g}")
            if len(energies) > average_over:
                prev = energies[-1 - average_over]
                if prev > 0 and 1.0 - energies[-1] / prev <= converge_thr:
                    break
        return energies


@functools.partial(jax.jit, static_argnames=())
def _scalar_energy_impl(unary, smooth):
    acc = jnp.promote_types(unary.dtype, jnp.float32)
    return jnp.sum(unary, dtype=acc) + jnp.sum(smooth, dtype=acc)


def _scalar_energy(model: SecondOrderStereo):
    return _scalar_energy_impl(model.unary_map(model.disp),
                               model.smooth_map(model.disp))
