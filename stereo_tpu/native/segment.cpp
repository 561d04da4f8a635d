// Native segmentation components of the stereo_tpu runtime.
//
// - felzenszwalb(): Efficient Graph-Based Image Segmentation (Felzenszwalb &
//   Huttenlocher, IJCV 2004) — the vgg_segment_gb equivalent
//   (imrender/vgg/seg_gb/segment-graph.h:47-80 defines the reference
//   behavior: sort 8-connected RGB-distance edges, union when the weight is
//   below both components' adaptive thresholds c/|C|, then merge components
//   smaller than min_size).  Written from the paper's algorithm; plain
//   std::vector structures.
//
// - connect_modes(): the host half of EDISON-style mean-shift segmentation
//   (vgg_segment_ms): the device filters each pixel to a (x,y,LUV) mode;
//   this routine unions 8-neighbors whose modes are within the range
//   bandwidth, transitively fuses adjacent regions with close mean modes,
//   and absorbs regions below min_region into their closest neighbor.
//
// Exposed with a C ABI for ctypes; no MATLAB/mex machinery.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <numeric>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  std::vector<int32_t> rank_;
  std::vector<int32_t> size_;
  explicit UnionFind(int n) : parent(n), rank_(n, 0), size_(n, 1) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int32_t find(int32_t a) {
    int32_t root = a;
    while (parent[root] != root) root = parent[root];
    while (parent[a] != root) {
      int32_t next = parent[a];
      parent[a] = root;
      a = next;
    }
    return root;
  }
  int32_t join(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return a;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    size_[a] += size_[b];
    if (rank_[a] == rank_[b]) rank_[a]++;
    return a;
  }
  int32_t size(int32_t a) { return size_[find(a)]; }
};

struct Edge {
  float w;
  int32_t a, b;
};

// Separable gaussian smoothing, matching the FH reference's behavior of
// clamping sigma below (segment-image.h smooths each channel before edges).
void gaussian_smooth(std::vector<float>& chan, int H, int W, float sigma) {
  sigma = std::max(sigma, 0.01f);
  const int len = std::max(1, (int)std::ceil(sigma * 4.0f)) + 1;
  std::vector<float> mask(len);
  for (int i = 0; i < len; i++)
    mask[i] = std::exp(-0.5f * (i / sigma) * (i / sigma));
  float sum = mask[0];
  for (int i = 1; i < len; i++) sum += 2.0f * mask[i];
  for (int i = 0; i < len; i++) mask[i] /= sum;

  std::vector<float> tmp(chan.size());
  // horizontal (clamped borders)
  for (int y = 0; y < H; y++) {
    for (int x = 0; x < W; x++) {
      float v = mask[0] * chan[y * W + x];
      for (int i = 1; i < len; i++) {
        int xl = std::max(x - i, 0), xr = std::min(x + i, W - 1);
        v += mask[i] * (chan[y * W + xl] + chan[y * W + xr]);
      }
      tmp[y * W + x] = v;
    }
  }
  // vertical
  for (int y = 0; y < H; y++) {
    for (int x = 0; x < W; x++) {
      float v = mask[0] * tmp[y * W + x];
      for (int i = 1; i < len; i++) {
        int yt = std::max(y - i, 0), yb = std::min(y + i, H - 1);
        v += mask[i] * (tmp[yt * W + x] + tmp[yb * W + x]);
      }
      chan[y * W + x] = v;
    }
  }
}

void compact_labels(UnionFind& uf, int n, uint32_t* labels_out) {
  std::map<int32_t, uint32_t> remap;
  for (int i = 0; i < n; i++) {
    int32_t r = uf.find(i);
    auto it = remap.find(r);
    if (it == remap.end()) {
      uint32_t id = (uint32_t)remap.size() + 1;  // 1-based like the reference
      remap[r] = id;
      labels_out[i] = id;
    } else {
      labels_out[i] = it->second;
    }
  }
}

}  // namespace

extern "C" {

// im: H*W*3 floats (row-major, channel-last, any scale).  labels_out: H*W.
// Returns the number of segments.
int felzenszwalb(const float* im, int H, int W, float sigma, float k,
                 int min_size, uint32_t* labels_out) {
  const int N = H * W;
  std::vector<float> r(N), g(N), b(N);
  for (int i = 0; i < N; i++) {
    r[i] = im[3 * i + 0];
    g[i] = im[3 * i + 1];
    b[i] = im[3 * i + 2];
  }
  gaussian_smooth(r, H, W, sigma);
  gaussian_smooth(g, H, W, sigma);
  gaussian_smooth(b, H, W, sigma);

  auto diff = [&](int p, int q) {
    float dr = r[p] - r[q], dg = g[p] - g[q], db = b[p] - b[q];
    return std::sqrt(dr * dr + dg * dg + db * db);
  };

  std::vector<Edge> edges;
  edges.reserve(4 * N);
  for (int y = 0; y < H; y++) {
    for (int x = 0; x < W; x++) {
      int p = y * W + x;
      if (x < W - 1) edges.push_back({diff(p, p + 1), p, p + 1});
      if (y < H - 1) edges.push_back({diff(p, p + W), p, p + W});
      if (x < W - 1 && y < H - 1) edges.push_back({diff(p, p + W + 1), p, p + W + 1});
      if (x < W - 1 && y > 0) edges.push_back({diff(p, p - W + 1), p, p - W + 1});
    }
  }
  std::sort(edges.begin(), edges.end(),
            [](const Edge& a, const Edge& b) { return a.w < b.w; });

  UnionFind uf(N);
  std::vector<float> threshold(N, k);  // c / |C| with |C| = 1
  for (const Edge& e : edges) {
    int32_t a = uf.find(e.a), b2 = uf.find(e.b);
    if (a == b2) continue;
    if (e.w <= threshold[a] && e.w <= threshold[b2]) {
      int32_t m = uf.join(a, b2);
      threshold[m] = e.w + k / uf.size(m);
    }
  }
  // post-process: absorb small components across any remaining edge
  for (const Edge& e : edges) {
    int32_t a = uf.find(e.a), b2 = uf.find(e.b);
    if (a != b2 && (uf.size(a) < min_size || uf.size(b2) < min_size))
      uf.join(a, b2);
  }

  compact_labels(uf, N, labels_out);
  uint32_t mx = 0;
  for (int i = 0; i < N; i++) mx = std::max(mx, labels_out[i]);
  return (int)mx;
}

// modes: H*W*3 filtered LUV modes (device mean-shift output).
// Returns number of segments (labels are 1-based).
int connect_modes(const float* modes, int H, int W, float h_r, int min_region,
                  uint32_t* labels_out) {
  const int N = H * W;
  // EDISON's TransitiveClosure merge radius is HALF the range bandwidth:
  // rR2 = (h_r)^2 * 0.25 (msImageProcessor.cpp:743)
  const float r2 = 0.25f * h_r * h_r;

  UnionFind uf(N);
  // 8-connected union where the filtered modes agree to within EDISON's
  // flood-fill threshold: |delta| < 1.0 PER CHANNEL (LUV_treshold = 1.0,
  // msImageProcessor.cpp:107, Fill :2027)
  const int offs[4][2] = {{0, 1}, {1, 0}, {1, 1}, {1, -1}};
  for (int y = 0; y < H; y++) {
    for (int x = 0; x < W; x++) {
      int p = y * W + x;
      for (auto& o : offs) {
        int ny = y + o[0], nx = x + o[1];
        if (ny < 0 || ny >= H || nx < 0 || nx >= W) continue;
        int q = ny * W + nx;
        bool close = true;
        for (int c = 0; c < 3; c++)
          close &= std::fabs(modes[3 * p + c] - modes[3 * q + c]) < 1.0f;
        if (close) uf.join(p, q);
      }
    }
  }

  // transitive closure: merge adjacent regions whose point-count-weighted
  // mean modes are within (h_r/2)^2, repeating until stable (the
  // TransitiveClosure loop of Segment, msImageProcessor.cpp:741-752)
  for (int pass = 0; pass < 10; pass++) {
    // accumulate region means
    std::map<int32_t, std::array<double, 4>> acc;  // sum LUV + count
    for (int i = 0; i < N; i++) {
      auto& a = acc[uf.find(i)];
      a[0] += modes[3 * i];
      a[1] += modes[3 * i + 1];
      a[2] += modes[3 * i + 2];
      a[3] += 1.0;
    }
    bool merged = false;
    for (int y = 0; y < H; y++) {
      for (int x = 0; x < W; x++) {
        int p = y * W + x;
        for (auto& o : offs) {
          int ny = y + o[0], nx = x + o[1];
          if (ny < 0 || ny >= H || nx < 0 || nx >= W) continue;
          int q = ny * W + nx;
          int32_t ra = uf.find(p), rb = uf.find(q);
          if (ra == rb) continue;
          auto& A = acc[ra];
          auto& B = acc[rb];
          float dd = 0;
          for (int c = 0; c < 3; c++) {
            float d = (float)(A[c] / A[3] - B[c] / B[3]);
            dd += d * d;
          }
          if (dd < r2) {
            int32_t m = uf.join(ra, rb);
            // merge accumulators so later tests in this pass see the fusion
            std::array<double, 4> sum;
            for (int c = 0; c < 4; c++) sum[c] = A[c] + B[c];
            acc[m] = sum;
            merged = true;
          }
        }
      }
    }
    if (!merged) break;
  }

  // prune small regions: absorb into the neighbor with the closest mean mode
  if (min_region > 1) {
    for (int pass = 0; pass < 64; pass++) {
      std::map<int32_t, std::array<double, 4>> acc;
      for (int i = 0; i < N; i++) {
        auto& a = acc[uf.find(i)];
        a[0] += modes[3 * i];
        a[1] += modes[3 * i + 1];
        a[2] += modes[3 * i + 2];
        a[3] += 1.0;
      }
      // for each small region find its best adjacent region
      std::map<int32_t, std::pair<float, int32_t>> best;  // region -> (d2, nbr)
      bool any_small = false;
      for (int y = 0; y < H; y++) {
        for (int x = 0; x < W; x++) {
          int p = y * W + x;
          for (auto& o : offs) {
            int ny = y + o[0], nx = x + o[1];
            if (ny < 0 || ny >= H || nx < 0 || nx >= W) continue;
            int q = ny * W + nx;
            int32_t ra = uf.find(p), rb = uf.find(q);
            if (ra == rb) continue;
            for (int swap = 0; swap < 2; swap++) {
              int32_t s = swap ? rb : ra, t = swap ? ra : rb;
              if (acc[s][3] >= min_region) continue;
              any_small = true;
              auto& A = acc[s];
              auto& B = acc[t];
              float dd = 0;
              for (int c = 0; c < 3; c++) {
                float d = (float)(A[c] / A[3] - B[c] / B[3]);
                dd += d * d;
              }
              auto it = best.find(s);
              if (it == best.end() || dd < it->second.first)
                best[s] = {dd, t};
            }
          }
        }
      }
      if (!any_small) break;
      for (auto& kv : best) uf.join(kv.first, kv.second.second);
    }
  }

  compact_labels(uf, N, labels_out);
  uint32_t mx = 0;
  for (int i = 0; i < N; i++) mx = std::max(mx, labels_out[i]);
  return (int)mx;
}

}  // extern "C"
