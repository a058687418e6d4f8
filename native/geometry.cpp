// Native host-side geometry engine: contour tracing, Douglas-Peucker
// simplification, polygon rasterization.
//
// These are the pointer-chasing ops that belong on the host CPU, not the
// TPU (SURVEY.md §2: the reference delegates them to OpenCV C++ —
// findContours/approxPolyDP/fillPoly, region_cleanup.py:893-909). The
// Python fallback in ops/contours.py implements identical semantics; this
// library removes its perimeter-proportional interpreter cost.
//
// Build: g++ -O2 -shared -fPIC -o libgeometry.so geometry.cpp
// (image_segmenter_tpu.ops.native builds it on first use and falls back to
// Python if no compiler is available.)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

// Moore neighborhood, clockwise from W — must match ops/contours.py.
const int MOORE[8][2] = {{-1, 0}, {-1, -1}, {0, -1}, {1, -1},
                         {1, 0},  {1, 1},   {0, 1},  {-1, 1}};

inline bool at(const uint8_t* m, int w, int x, int y) { return m[y * w + x] != 0; }

}  // namespace

extern "C" {

// Trace external contours of a binary mask (h x w, nonzero = set).
// Output: pts (x,y int32 pairs, compressed collinear runs), offsets[i] =
// start index of contour i in pts (offsets[n_contours] = total points).
// Returns the number of contours, or -1 if capacity was exceeded.
int ig_trace_contours(const uint8_t* mask, int h, int w,
                      int32_t* out_pts, int64_t max_pts,
                      int64_t* out_offsets, int64_t max_contours) {
    const int W = w + 2, H = h + 2;
    std::vector<uint8_t> padded((size_t)W * H, 0);
    std::vector<uint8_t> visited((size_t)W * H, 0);
    for (int y = 0; y < h; y++)
        std::memcpy(&padded[(size_t)(y + 1) * W + 1], &mask[(size_t)y * w], w);

    int64_t n_pts = 0;
    int64_t n_contours = 0;
    std::vector<int32_t> contour;  // raw chain (x, y) in padded coords

    for (int y0 = 1; y0 <= h; y0++) {
        for (int x0 = 1; x0 <= w; x0++) {
            if (!padded[(size_t)y0 * W + x0]) continue;
            if (padded[(size_t)y0 * W + x0 - 1]) continue;  // not a left-edge start
            if (visited[(size_t)y0 * W + x0]) continue;

            contour.clear();
            int bx = x0, by = y0;
            int px = x0 - 1, py = y0;  // background to the left
            const int sx = bx, sy = by;
            int secx = -9, secy = -9;
            bool have_second = false;
            const int64_t limit = 4LL * W * H;
            // Termination: the walk is deterministic, so standing on the
            // start pixel with the computed NEXT pixel equal to the walk's
            // second pixel means the orbit repeats. (Jacob's criterion can
            // miss on rho-shaped walks.) Mirrors ops/contours.py exactly.
            while (true) {
                int dx = px - bx, dy = py - by;
                int i0 = 0;
                for (int i = 0; i < 8; i++)
                    if (MOORE[i][0] == dx && MOORE[i][1] == dy) { i0 = i; break; }
                bool found = false;
                int nx = 0, ny = 0, npx = 0, npy = 0;
                for (int k = 1; k <= 8; k++) {
                    const int* d = MOORE[(i0 + k) % 8];
                    int cx = bx + d[0], cy = by + d[1];
                    if (padded[(size_t)cy * W + cx]) {
                        const int* pd = MOORE[(i0 + k - 1) % 8];
                        npx = bx + pd[0]; npy = by + pd[1];
                        nx = cx; ny = cy;
                        found = true;
                        break;
                    }
                }
                if (have_second && bx == sx && by == sy && found &&
                    nx == secx && ny == secy)
                    break;  // orbit repeats; start already recorded
                contour.push_back(bx - 1);
                contour.push_back(by - 1);
                visited[(size_t)by * W + bx] = 1;
                if (!found) break;  // isolated pixel
                if (!have_second) { secx = nx; secy = ny; have_second = true; }
                px = npx; py = npy;
                bx = nx; by = ny;
                if ((int64_t)contour.size() / 2 > limit) break;
            }

            // compress collinear unit steps (CHAIN_APPROX_SIMPLE-style)
            int64_t n = (int64_t)contour.size() / 2;
            if (n_contours >= max_contours) return -1;
            out_offsets[n_contours] = n_pts;
            if (n < 3) {
                for (int64_t i = 0; i < n; i++) {
                    if (n_pts >= max_pts) return -1;
                    out_pts[2 * n_pts] = contour[2 * i];
                    out_pts[2 * n_pts + 1] = contour[2 * i + 1];
                    n_pts++;
                }
            } else {
                for (int64_t i = 0; i < n; i++) {
                    int64_t ip = (i + n - 1) % n, in = (i + 1) % n;
                    int d1x = contour[2 * i] - contour[2 * ip];
                    int d1y = contour[2 * i + 1] - contour[2 * ip + 1];
                    int d2x = contour[2 * in] - contour[2 * i];
                    int d2y = contour[2 * in + 1] - contour[2 * i + 1];
                    if (d1x == d2x && d1y == d2y) continue;  // collinear run
                    if (n_pts >= max_pts) return -1;
                    out_pts[2 * n_pts] = contour[2 * i];
                    out_pts[2 * n_pts + 1] = contour[2 * i + 1];
                    n_pts++;
                }
                if (out_offsets[n_contours] == n_pts) {  // fully collinear ring
                    if (n_pts >= max_pts) return -1;
                    out_pts[2 * n_pts] = contour[0];
                    out_pts[2 * n_pts + 1] = contour[1];
                    n_pts++;
                }
            }
            n_contours++;
        }
    }
    out_offsets[n_contours] = n_pts;
    return (int)n_contours;
}

// Douglas-Peucker on a closed polygon. Returns the number of kept points.
int64_t ig_approx_polydp(const int32_t* pts, int64_t n, double eps,
                         int32_t* out) {
    if (n < 3 || eps <= 0) {
        std::memcpy(out, pts, sizeof(int32_t) * 2 * n);
        return n;
    }
    std::vector<uint8_t> keep(n, 0);
    // split at the farthest point from pts[0]
    double best = -1.0;
    int64_t far_i = 0;
    for (int64_t i = 0; i < n; i++) {
        double dx = pts[2 * i] - pts[0], dy = pts[2 * i + 1] - pts[1];
        double d = dx * dx + dy * dy;
        if (d > best) { best = d; far_i = i; }
    }
    keep[0] = keep[far_i] = keep[n - 1] = 1;

    std::vector<std::pair<int64_t, int64_t>> stack;
    stack.push_back({0, far_i});
    if (far_i < n - 1) stack.push_back({far_i, n - 1});
    while (!stack.empty()) {
        auto [a, b] = stack.back();
        stack.pop_back();
        if (b <= a + 1) continue;
        double ax = pts[2 * a], ay = pts[2 * a + 1];
        double sx = pts[2 * b] - ax, sy = pts[2 * b + 1] - ay;
        double L = std::sqrt(sx * sx + sy * sy);
        double dmax = -1.0;
        int64_t imax = a + 1;
        for (int64_t i = a + 1; i < b; i++) {
            double rx = pts[2 * i] - ax, ry = pts[2 * i + 1] - ay;
            double d = (L == 0.0) ? std::sqrt(rx * rx + ry * ry)
                                  : std::fabs(sx * ry - sy * rx) / L;
            if (d > dmax) { dmax = d; imax = i; }
        }
        if (dmax > eps) {
            keep[imax] = 1;
            stack.push_back({a, imax});
            stack.push_back({imax, b});
        }
    }
    int64_t m = 0;
    for (int64_t i = 0; i < n; i++)
        if (keep[i]) { out[2 * m] = pts[2 * i]; out[2 * m + 1] = pts[2 * i + 1]; m++; }
    return m;
}

// Even-odd scanline fill of a closed polygon into mask (values set to 1),
// boundary pixels included — must match ops/contours.py fill_polygon.
void ig_fill_polygon(uint8_t* mask, int h, int w,
                     const int32_t* pts, int64_t n) {
    if (n == 0) return;
    if (n < 3) {
        for (int64_t i = 0; i < n; i++) {
            int x = pts[2 * i], y = pts[2 * i + 1];
            if (x >= 0 && x < w && y >= 0 && y < h) mask[(size_t)y * w + x] = 1;
        }
        return;
    }
    double ymin = 1e30, ymax = -1e30;
    for (int64_t i = 0; i < n; i++) {
        ymin = std::min(ymin, (double)pts[2 * i + 1]);
        ymax = std::max(ymax, (double)pts[2 * i + 1]);
    }
    int y0 = std::max(0, (int)std::floor(ymin));
    int y1 = std::min(h - 1, (int)std::ceil(ymax));
    std::vector<double> xs;
    for (int y = y0; y <= y1; y++) {
        xs.clear();
        for (int64_t i = 0; i < n; i++) {
            int64_t j = (i + 1) % n;
            double yi = pts[2 * i + 1], yj = pts[2 * j + 1];
            double xi = pts[2 * i], xj = pts[2 * j];
            if ((yi <= y && yj > y) || (yj <= y && yi > y)) {
                double t = (y - yi) / (yj - yi);
                xs.push_back(xi + t * (xj - xi));
            }
        }
        std::sort(xs.begin(), xs.end());
        for (size_t k = 0; k + 1 < xs.size(); k += 2) {
            int lo = std::max(0, (int)std::ceil(xs[k] - 0.5));
            int hi = std::min(w - 1, (int)std::floor(xs[k + 1] + 0.5));
            for (int x = lo; x <= hi; x++) mask[(size_t)y * w + x] = 1;
        }
    }
    // boundary pixels
    for (int64_t i = 0; i < n; i++) {
        int64_t j = (i + 1) % n;
        int ax = pts[2 * i], ay = pts[2 * i + 1];
        int bx = pts[2 * j], by = pts[2 * j + 1];
        int steps = std::max(std::abs(bx - ax), std::abs(by - ay)) + 1;
        for (int s = 0; s < steps; s++) {
            double t = steps > 1 ? (double)s / (steps - 1) : 0.0;
            int x = (int)std::lround(ax + t * (bx - ax));
            int y = (int)std::lround(ay + t * (by - ay));
            if (x >= 0 && x < w && y >= 0 && y < h) mask[(size_t)y * w + x] = 1;
        }
    }
}

// Connected-component labeling over a per-pixel color key: pixels connect
// iff both valid and equal color (4- or 8-connectivity). Host-side
// union-find twin of the TPU label-propagation kernel
// (image_segmenter_tpu/ops/connected_components.py) with the IDENTICAL
// label convention: a component's label is the linear index of its first
// pixel in raster order; invalid pixels get -1. Also fills per-root stats:
// sizes[root] = pixel count, bbox[root] = (x_min, y_min, x_max, y_max)
// (unset elsewhere: sizes 0, bbox (big, big, -1, -1)).
//
// Union-find with path halving; unions keep the SMALLER linear index as
// root, so find(p) is the raster-first pixel directly. Raster-scan locality
// keeps this effectively linear: ~10 ms per megapixel single-threaded vs
// ~1.45 s for the device kernel on the tunneled chip (ROADMAP item 4).
static int32_t uf_find(int32_t* parent, int32_t x) {
    while (parent[x] != x) {
        parent[x] = parent[parent[x]];  // path halving
        x = parent[x];
    }
    return x;
}

static inline void uf_union(int32_t* parent, int32_t a, int32_t b) {
    a = uf_find(parent, a);
    b = uf_find(parent, b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
}

void ig_label_components(const int32_t* color, const uint8_t* valid,
                         int h, int w, int connectivity,
                         int32_t* labels, int32_t* sizes, int32_t* bbox) {
    const int64_t n = (int64_t)h * w;
    std::vector<int32_t> parent((size_t)n);
    for (int64_t i = 0; i < n; i++) parent[i] = (int32_t)i;

    for (int y = 0; y < h; y++) {
        const int64_t row = (int64_t)y * w;
        for (int x = 0; x < w; x++) {
            const int64_t p = row + x;
            if (!valid[p]) continue;
            const int32_t c = color[p];
            if (x > 0 && valid[p - 1] && color[p - 1] == c)
                uf_union(parent.data(), (int32_t)p, (int32_t)(p - 1));
            if (y > 0) {
                const int64_t up = p - w;
                if (valid[up] && color[up] == c)
                    uf_union(parent.data(), (int32_t)p, (int32_t)up);
                if (connectivity == 8) {
                    if (x > 0 && valid[up - 1] && color[up - 1] == c)
                        uf_union(parent.data(), (int32_t)p, (int32_t)(up - 1));
                    if (x + 1 < w && valid[up + 1] && color[up + 1] == c)
                        uf_union(parent.data(), (int32_t)p, (int32_t)(up + 1));
                }
            }
        }
    }

    const int32_t BIG = 1 << 30;
    for (int64_t i = 0; i < n; i++) {
        sizes[i] = 0;
        bbox[4 * i + 0] = BIG; bbox[4 * i + 1] = BIG;
        bbox[4 * i + 2] = -1;  bbox[4 * i + 3] = -1;
    }
    for (int y = 0; y < h; y++) {
        const int64_t row = (int64_t)y * w;
        for (int x = 0; x < w; x++) {
            const int64_t p = row + x;
            if (!valid[p]) { labels[p] = -1; continue; }
            const int32_t r = uf_find(parent.data(), (int32_t)p);
            labels[p] = r;
            sizes[r] += 1;
            int32_t* bb = &bbox[4 * (int64_t)r];
            if (x < bb[0]) bb[0] = x;
            if (y < bb[1]) bb[1] = y;
            if (x > bb[2]) bb[2] = x;
            if (y > bb[3]) bb[3] = y;
        }
    }
}

}  // extern "C"
