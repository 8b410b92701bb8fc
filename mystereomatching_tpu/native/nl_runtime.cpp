// Host-side native runtime for the non-local (MST) stack.
//
// TPU-native framework companion to the reference's NL/ directory
// (qx_mst_kruskals_image / qx_tree_filter / ctmf): the device path runs
// Boruvka + pointer-doubling filters in JAX (ops/mst.py); this C++
// library provides the host-bound equivalents — used as an independent
// validation oracle in tests and as a CPU fallback runtime when no
// accelerator is attached. Implemented from the published algorithms
// (Kruskal with 256-bin counting sort; BFS rooting; O(n*D) two-pass tree
// filter; histogram median), not transcribed from the reference.
//
// Build: make (g++ -O3 -shared -fPIC [-fopenmp])

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

extern "C" {

// --- median filters ---------------------------------------------------------

// 3x3 median, per channel, replicate border.
void msm_median3x3_u8(const uint8_t* src, uint8_t* dst, int h, int w, int ch) {
  std::vector<uint8_t> win(9);
  for (int c = 0; c < ch; ++c) {
    for (int v = 0; v < h; ++v) {
      for (int u = 0; u < w; ++u) {
        int k = 0;
        for (int dv = -1; dv <= 1; ++dv) {
          int vv = std::min(std::max(v + dv, 0), h - 1);
          for (int du = -1; du <= 1; ++du) {
            int uu = std::min(std::max(u + du, 0), w - 1);
            win[k++] = src[(vv * w + uu) * ch + c];
          }
        }
        std::nth_element(win.begin(), win.begin() + 4, win.end());
        dst[(v * w + u) * ch + c] = win[4];
      }
    }
  }
}

// Constant-time-per-pixel histogram median (the ctmf idea): sliding column
// histograms merged into a kernel histogram, O(1) updates per step.
void msm_median_hist_u8(const uint8_t* src, uint8_t* dst, int h, int w,
                        int radius) {
  const int r = radius;
  std::vector<int> colhist(w * 256, 0);
  auto colh = [&](int u) { return colhist.data() + u * 256; };

  // init column histograms for rows [0, r]
  for (int u = 0; u < w; ++u)
    for (int v = 0; v <= std::min(r, h - 1); ++v)
      colh(u)[src[v * w + u]]++;

  std::vector<int> hist(256);
  for (int v = 0; v < h; ++v) {
    if (v > 0) {
      int add = v + r, rem = v - r - 1;
      if (add < h)
        for (int u = 0; u < w; ++u) colh(u)[src[add * w + u]]++;
      if (rem >= 0)
        for (int u = 0; u < w; ++u) colh(u)[src[rem * w + u]]--;
    }
    // kernel histogram for u=0
    std::fill(hist.begin(), hist.end(), 0);
    int cnt = 0;
    int v0 = std::max(0, v - r), v1 = std::min(h - 1, v + r);
    int rows = v1 - v0 + 1;
    for (int u = 0; u <= std::min(r, w - 1); ++u) {
      for (int b = 0; b < 256; ++b) hist[b] += colh(u)[b];
      cnt += rows;
    }
    for (int u = 0; u < w; ++u) {
      if (u > 0) {
        int add = u + r, rem = u - r - 1;
        if (add < w) {
          for (int b = 0; b < 256; ++b) hist[b] += colh(add)[b];
          cnt += rows;
        }
        if (rem >= 0) {
          for (int b = 0; b < 256; ++b) hist[b] -= colh(rem)[b];
          cnt -= rows;
        }
      }
      int half = (cnt + 1) / 2, acc = 0, med = 0;
      for (int b = 0; b < 256; ++b) {
        acc += hist[b];
        if (acc >= half) { med = b; break; }
      }
      dst[v * w + u] = (uint8_t)med;
    }
  }
}

// --- MST: Kruskal w/ counting sort + BFS rooting ----------------------------

// image: [h*w*ch] uint8 (median-prefiltered by caller if desired).
// Outputs: parent[n] (root 0 -> itself), weight[n] (edge to parent),
// order[n] = BFS topological order (parents before children).
// nr: 4 or 8 neighbors (qx_mst_kruskals_image.h:11-12; the 8-neighbor
// enumeration appends per cell the down-right then down-left diagonal,
// row-major — cpp:71-86).
void msm_mst_grid_n(const uint8_t* image, int h, int w, int ch, int nr,
                    int32_t* parent, int32_t* weight, int32_t* order) {
  const int n = h * w;
  const int ne4 = h * (w - 1) + (h - 1) * w;
  const int ne = nr == 8 ? ne4 + 2 * (h - 1) * (w - 1) : ne4;
  std::vector<int32_t> eu(ne), ev(ne);
  std::vector<uint8_t> ew(ne);
  int k = 0;
  auto wdiff = [&](int a, int b) {
    int m = 0;
    for (int c = 0; c < ch; ++c)
      m = std::max(m, std::abs((int)image[a * ch + c] - (int)image[b * ch + c]));
    return (uint8_t)m;
  };
  for (int v = 0; v < h; ++v)            // right edges, row-major
    for (int u = 0; u + 1 < w; ++u) {
      int a = v * w + u;
      eu[k] = a; ev[k] = a + 1; ew[k] = wdiff(a, a + 1); ++k;
    }
  for (int u = 0; u < w; ++u)            // down edges, column-major (ref order)
    for (int v = 0; v + 1 < h; ++v) {
      int a = v * w + u;
      eu[k] = a; ev[k] = a + w; ew[k] = wdiff(a, a + w); ++k;
    }
  if (nr == 8)                           // diagonals, row-major, DR then DL
    for (int v = 0; v + 1 < h; ++v)
      for (int u = 0; u + 1 < w; ++u) {
        int a = v * w + u;
        eu[k] = a; ev[k] = a + w + 1; ew[k] = wdiff(a, a + w + 1); ++k;
        eu[k] = a + 1; ev[k] = a + w; ew[k] = wdiff(a + 1, a + w); ++k;
      }

  // 256-bin counting sort of edge indices by weight (stable)
  std::vector<int> bins(257, 0);
  for (int i = 0; i < ne; ++i) bins[ew[i] + 1]++;
  for (int b = 0; b < 256; ++b) bins[b + 1] += bins[b];
  std::vector<int32_t> sorted(ne);
  {
    std::vector<int> pos(bins.begin(), bins.end() - 1);
    for (int i = 0; i < ne; ++i) sorted[pos[ew[i]]++] = i;
  }

  // union-find Kruskal
  std::vector<int32_t> uf(n);
  for (int i = 0; i < n; ++i) uf[i] = i;
  std::vector<int32_t> find_stack;
  auto find = [&](int x) {
    int r = x;
    while (uf[r] != r) r = uf[r];
    while (uf[x] != r) { int nx = uf[x]; uf[x] = r; x = nx; }
    return r;
  };
  // adjacency of chosen edges
  std::vector<int32_t> head(n, -1), nxt(2 * (n - 1)), adj(2 * (n - 1)),
      adjw(2 * (n - 1));
  int m = 0;
  for (int s = 0; s < ne && m < 2 * (n - 1); ++s) {
    int e = sorted[s];
    int ra = find(eu[e]), rb = find(ev[e]);
    if (ra == rb) continue;
    uf[ra] = rb;
    adj[m] = ev[e]; adjw[m] = ew[e]; nxt[m] = head[eu[e]]; head[eu[e]] = m; ++m;
    adj[m] = eu[e]; adjw[m] = ew[e]; nxt[m] = head[ev[e]]; head[ev[e]] = m; ++m;
  }

  // BFS from node 0
  std::vector<int32_t> queue(n);
  std::vector<uint8_t> seen(n, 0);
  int qh = 0, qt = 0;
  queue[qt++] = 0; seen[0] = 1; parent[0] = 0; weight[0] = 0;
  while (qh < qt) {
    int x = queue[qh++];
    for (int e = head[x]; e != -1; e = nxt[e]) {
      int y = adj[e];
      if (!seen[y]) {
        seen[y] = 1;
        parent[y] = x;
        weight[y] = adjw[e];
        queue[qt++] = y;
      }
    }
  }
  std::memcpy(order, queue.data(), sizeof(int32_t) * n);
}

void msm_mst_grid(const uint8_t* image, int h, int w, int ch,
                  int32_t* parent, int32_t* weight, int32_t* order) {
  msm_mst_grid_n(image, h, w, ch, 4, parent, weight, order);
}

// --- two-pass tree filter ---------------------------------------------------

// values: [n, d] row-major; out: [n, d]. sim(x) = exp(-weight[x]/(255*sigma)).
void msm_tree_filter(const int32_t* parent, const int32_t* weight,
                     const int32_t* order, const float* values, float* out,
                     int n, int d, float sigma) {
  double table[256];
  double s = sigma < 0.01 ? 0.01 : sigma;
  for (int i = 0; i < 256; ++i) table[i] = std::exp(-double(i) / (255.0 * s));

  std::vector<double> up(size_t(n) * d);
  for (size_t i = 0; i < size_t(n) * d; ++i) up[i] = values[i];

  // leaf -> root: reverse topological order
  for (int i = n - 1; i >= 1; --i) {
    int x = order[i];
    int p = parent[x];
    double wgt = table[weight[x]];
    double* px = up.data() + size_t(x) * d;
    double* pp = up.data() + size_t(p) * d;
    for (int j = 0; j < d; ++j) pp[j] += wgt * px[j];
  }
  // root -> leaf: S(c) = w*(S(p) - w*Up(c)) + Up(c)
  std::vector<double> fin(size_t(n) * d);
  {
    int r = order[0];
    double* pr = up.data() + size_t(r) * d;
    double* fr = fin.data() + size_t(r) * d;
    for (int j = 0; j < d; ++j) fr[j] = pr[j];
  }
  for (int i = 1; i < n; ++i) {
    int x = order[i];
    int p = parent[x];
    double wgt = table[weight[x]];
    double* ux = up.data() + size_t(x) * d;
    double* fp = fin.data() + size_t(p) * d;
    double* fx = fin.data() + size_t(x) * d;
    for (int j = 0; j < d; ++j)
      fx[j] = wgt * (fp[j] - wgt * ux[j]) + ux[j];
  }
  for (size_t i = 0; i < size_t(n) * d; ++i) out[i] = (float)fin[i];
}

}  // extern "C"
