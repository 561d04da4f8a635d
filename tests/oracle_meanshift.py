"""Literal numpy transcription of EDISON's mean-shift segmentation phases.

Serves as the independent oracle for stereo_tpu's mean-shift layer
(`proposals/segmentation.py` device filter + `native/segment.cpp`
``connect_modes``), the way ``tests/oracles.py`` pins the TRW-S layers.

Transcribed control-flow-faithfully (quirks included) from the reference:

- ``filter_oracle``: NewNonOptimizedFilter
  (imrender/vgg/seg_ms/msImageProcessor.cpp:4305-4636): per-pixel serial
  mean-shift in the joint (x, y, L, u, v) space scaled by (h_s, h_r);
  uniform kernel with *strict* spatial/range tests applied separately; the
  4x L-weight when the current window centre's scaled L exceeds 80/h_r
  (:4484-4487); first convergence test in scaled units, later ones in
  unscaled units (:4520-4523 vs :4609-4613); LIMIT=100, EPSILON=0.01
  (ms.h); the final mean-shift vector applied once more on loop exit
  (:4619-4621); all arithmetic in double, modes stored as float32 (:4625).

- ``segment_oracle``: the post-filter merge phases of Segment
  (msImageProcessor.cpp:703-800):
  * Connect (:1911-1958) + Fill (:1982-2064): 8-connected flood over
    pixels whose float LUV modes differ < LUV_treshold = 1.0 per channel
    (:107, :2027) — with the reference's commented-out column-boundary
    check (:2010-2018), so neighbour offsets WRAP across row ends; the
    region mode is the raster-first seed pixel's value (:1944).
  * TransitiveClosure (:2349-2545) in Segment's call pattern
    (:744-752): once, then repeated while the region count did not
    decrease, at most 10 extra times.  Each pass builds the RAM from
    right/below neighbours over i < H-1, j < W-1 only (:2121-2127),
    adjacency lists kept sorted ascending (RAList.cpp Insert), joins
    region pairs where InWindow (:3157-3178) passes in either direction
    (the 4x L-quirk tests mode1's *unscaled* L > 80), then relabels by
    ascending first occurrence and recomputes modes as float32
    point-count-weighted means (:2453-2533).
  * Prune (:2734-2965): iteratively absorbs every region with
    modePointCounts < minRegion into its adjacent region of minimum
    SqDistance (:3194-3218 — float arithmetic, range subspace only due to
    the double k++), candidates evaluated against pass-start modes, first
    (lowest-label) neighbour winning ties, repeating while any small
    region existed.

The mex wrapper (vgg_segment_ms.cxx:74) runs Segment with HIGH_SPEEDUP
(NewOptimizedFilter2, a basin-of-attraction approximation layer); the
non-optimized filter is the exact algorithm that layer approximates and is
what the device filter implements.  The merge phases are identical under
every speedup level.
"""

from __future__ import annotations

import numpy as np

EPSILON = 0.01  # ms.h:106
LIMIT = 100     # ms.h:111
LUV_TRESHOLD = 1.0


def filter_oracle(luv: np.ndarray, h_s: int, h_r: float,
                  limit: int = LIMIT) -> np.ndarray:
    """[H, W, 3] float LUV -> filtered modes [H, W, 3] float32 (msRawData)."""
    H, W, _ = luv.shape
    sS, sR = float(h_s), float(h_r)
    data = np.asarray(luv, np.float64)
    # sdata layout: (x/sS, y/sS, L/sR, u/sR, v/sR) per pixel (:4346-4355)
    xs = (np.arange(W, dtype=np.float64) / sS)[None, :].repeat(H, 0)
    ys = (np.arange(H, dtype=np.float64) / sS)[:, None].repeat(W, 1)
    sval = data / sR
    hiLTr = 80.0 / sR
    out = np.zeros((H, W, 3), np.float32)

    def ms_vector(yk):
        """LatticeMSVector inline (:4457-4517): uniform weights, strict
        spatial then range window tests, mean of in-window points - yk."""
        # lattice points with ((x/sS - yk0)^2 + (y/sS - yk1)^2) < 1 all lie
        # in |x - yk0*sS| < sS — enumerate that box exactly
        x0 = max(0, int(np.ceil(yk[0] * sS - sS)))
        x1 = min(W - 1, int(np.floor(yk[0] * sS + sS)))
        y0 = max(0, int(np.ceil(yk[1] * sS - sS)))
        y1 = min(H - 1, int(np.floor(yk[1] * sS + sS)))
        if x1 < x0 or y1 < y0:
            return np.zeros(5)
        px = xs[y0:y1 + 1, x0:x1 + 1]
        py = ys[y0:y1 + 1, x0:x1 + 1]
        pv = sval[y0:y1 + 1, x0:x1 + 1]
        dsp = (px - yk[0]) ** 2 + (py - yk[1]) ** 2
        dL = pv[..., 0] - yk[2]
        quad = 4.0 if yk[2] > hiLTr else 1.0  # yk's L, tested every call
        dr = (quad * dL * dL + (pv[..., 1] - yk[3]) ** 2
              + (pv[..., 2] - yk[4]) ** 2)
        w = (dsp < 1.0) & (dr < 1.0)
        n = np.count_nonzero(w)
        if n == 0:
            return np.zeros(5)
        mh = np.empty(5)
        mh[0] = px[w].sum() / n - yk[0]
        mh[1] = py[w].sum() / n - yk[1]
        mh[2:] = pv[w].sum(axis=0) / n - yk[2:]
        return mh

    for i in range(H * W):
        y, x = divmod(i, W)
        yk = np.array([xs[y, x], ys[y, x], sval[y, x, 0], sval[y, x, 1],
                       sval[y, x, 2]])
        Mh = ms_vector(yk)
        mvAbs = float(np.sum(Mh * Mh))  # first test: scaled units (:4521)
        it = 1
        while mvAbs >= EPSILON and it < limit:
            yk = yk + Mh
            Mh = ms_vector(yk)
            # subsequent tests: unscaled units (:4609-4613)
            mvAbs = ((Mh[0] ** 2 + Mh[1] ** 2) * sS * sS
                     + (Mh[2] ** 2 + Mh[3] ** 2 + Mh[4] ** 2) * sR * sR)
            it += 1
        yk = yk + Mh  # final shift on every exit path (:4619-4621)
        out[y, x] = (yk[2:] * sR).astype(np.float32)
    return out


# --------------------------------------------------------------- merge phases


def _connect(modes: np.ndarray, H: int, W: int):
    """Connect + Fill: flood over the wrap-quirk 8-neighbour lattice.

    Returns (labels [H*W] int, region_modes [R,3] float32, counts [R] int).
    """
    N = H * W
    m = modes.reshape(N, 3)
    # neigh offsets exactly as Connect defines them (:1915-1922), applied to
    # the linear index with only the 0 <= q < N bound (:2021-2023)
    neigh = (1, 1 - W, -W, -(1 + W), -1, W - 1, W, W + 1)
    labels = np.full(N, -1, np.int64)
    region_modes = []
    counts = []
    label = -1
    for seed in range(N):
        if labels[seed] >= 0:
            continue
        label += 1
        labels[seed] = label
        region_modes.append(m[seed].copy())  # modes[label] = LUV_data[seed]
        stack = [seed]
        cnt = 1
        while stack:
            p = stack.pop()
            for off in neigh:
                q = p + off
                if 0 <= q < N and labels[q] < 0 and \
                        np.all(np.abs(m[p] - m[q]) < LUV_TRESHOLD):
                    labels[q] = label
                    cnt += 1
                    stack.append(q)
        counts.append(cnt)
    return (labels, np.asarray(region_modes, np.float32),
            np.asarray(counts, np.int64))


def _build_ram(labels: np.ndarray, H: int, W: int, rc: int):
    """BuildRAM (:2085-2210): right/below pairs over i < H-1, j < W-1 only;
    per-region neighbour lists sorted ascending (RAList::Insert)."""
    adj = [set() for _ in range(rc)]
    lab = labels.reshape(H, W)
    for i in range(H - 1):
        for j in range(W - 1):
            cur = lab[i, j]
            right = lab[i, j + 1]
            bottom = lab[i + 1, j]
            if cur != right:
                adj[cur].add(right)
                adj[right].add(cur)
            if cur != bottom:
                adj[cur].add(bottom)
                adj[bottom].add(cur)
    return [sorted(s) for s in adj]


def _in_window(modes: np.ndarray, i: int, j: int, h_r: float) -> bool:
    """InWindow (:3157-3178): range subspace, double arithmetic, 4x on the
    L term when mode1's unscaled L > 80; strict diff < 0.25."""
    diff = 0.0
    for p in range(3):
        el = (float(modes[i, p]) - float(modes[j, p])) / h_r
        diff += 4.0 * el * el if (p == 0 and modes[i, 0] > 80) else el * el
    return diff < 0.25


def _sq_distance(modes: np.ndarray, i: int, j: int, h_r: float) -> float:
    """SqDistance (:3194-3218): float32 arithmetic, range subspace only
    (the loop's double k++ skips the spatial subspace entirely)."""
    dist = np.float32(0)
    for p in range(3):
        el = np.float32((modes[i, p] - modes[j, p]) / np.float32(h_r))
        dist = np.float32(dist + el * el)
    return float(dist)


class _CanonicalElements:
    """The reference's quirky in-place union on raList labels
    (:2403-2427) — kept literal rather than replaced by textbook
    union-find, so the oracle exercises the same merge order."""

    def __init__(self, rc: int):
        self.label = list(range(rc))

    def join(self, i: int, j: int) -> None:
        iCan = i
        while self.label[iCan] != iCan:
            iCan = self.label[iCan]
        jCan = j
        while self.label[jCan] != jCan:
            jCan = self.label[jCan]
        if iCan < jCan:
            self.label[jCan] = iCan
        else:
            self.label[self.label[iCan]] = jCan
            self.label[iCan] = jCan

    def level(self) -> None:
        for i in range(len(self.label)):
            c = i
            while self.label[c] != c:
                c = self.label[c]
            self.label[i] = c


def _relabel(ce: _CanonicalElements, labels, modes, counts, rc):
    """Steps 3-4 shared by TransitiveClosure and Prune (:2437-2535):
    level, accumulate float32 count-weighted modes by canonical element in
    ascending region order, relabel by first occurrence."""
    ce.level()
    modes_buffer = np.zeros((rc, 3), np.float32)
    mpc_buffer = np.zeros(rc, np.int64)
    for i in range(rc):
        c = ce.label[i]
        modes_buffer[c] += np.float32(counts[i]) * modes[i]
        mpc_buffer[c] += counts[i]
    label_buffer = np.full(rc, -1, np.int64)
    new_modes = []
    new_counts = []
    label = -1
    for i in range(rc):
        c = ce.label[i]
        if label_buffer[c] < 0:
            label += 1
            label_buffer[c] = label
            new_modes.append(modes_buffer[c] / np.float32(mpc_buffer[c]))
            new_counts.append(mpc_buffer[c])
    new_labels = label_buffer[np.asarray(ce.label)[labels]]
    return (new_labels, np.asarray(new_modes, np.float32),
            np.asarray(new_counts, np.int64), label + 1)


def _transitive_closure(labels, modes, counts, rc, H, W, h_r):
    adj = _build_ram(labels, H, W, rc)
    ce = _CanonicalElements(rc)
    for i in range(rc):
        for j in adj[i]:  # ascending, as the sorted RAList traversal
            # edgeStrength = 0 < epsilon = 1 with no weight map (:99)
            if _in_window(modes, i, j, h_r):
                ce.join(i, j)
    return _relabel(ce, labels, modes, counts, rc)


def _prune(labels, modes, counts, rc, H, W, h_r, min_region):
    while True:
        min_region_count = 0
        adj = _build_ram(labels, H, W, rc)
        ce = _CanonicalElements(rc)
        for i in range(rc):
            if counts[i] < min_region and adj[i]:
                min_region_count += 1
                candidate = adj[i][0]  # first (lowest-label) neighbour
                best = _sq_distance(modes, i, candidate, h_r)
                for j in adj[i][1:]:
                    d = _sq_distance(modes, i, j, h_r)
                    if d < best:  # strict: ties keep the earlier label
                        best = d
                        candidate = j
                ce.join(i, candidate)
        labels, modes, counts, rc = _relabel(ce, labels, modes, counts, rc)
        if min_region_count == 0:
            return labels, modes, counts, rc


def segment_oracle(modes: np.ndarray, h_r: float, min_region: int):
    """Filtered modes [H, W, 3] -> (labels [H, W] int 0-based, modes, counts).

    The post-filter portion of Segment (:744-800): Connect, the
    TransitiveClosure repetition pattern, Prune.
    """
    H, W, _ = modes.shape
    modes = np.asarray(modes, np.float32)
    labels, rmodes, counts = _connect(modes, H, W)
    labels, rmodes, counts, rc = _transitive_closure(
        labels, rmodes, counts, len(counts), H, W, h_r)
    old_rc = rc
    counter = 0
    while True:  # do { ... } while ((deltaRC <= 0) && (counter < 10))
        labels, rmodes, counts, rc = _transitive_closure(
            labels, rmodes, counts, rc, H, W, h_r)
        delta = old_rc - rc
        old_rc = rc
        counter += 1
        if not (delta <= 0 and counter < 10):
            break
    labels, rmodes, counts, rc = _prune(labels, rmodes, counts, rc, H, W,
                                        h_r, min_region)
    return labels.reshape(H, W), rmodes, counts
