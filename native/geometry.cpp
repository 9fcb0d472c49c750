// Native host geometry kernels for the straightening pipeline.
//
// The reference leans on OpenCV (findContours/minAreaRect/boxPoints/fillPoly,
// /root/reference/straighten/straighten_mask_3d.py:365-436) for per-slice
// de-pedicle mask construction. This library provides the same operations as
// a small dependency-free C++ kernel set, exposed over a C ABI for ctypes:
//
//   cc_label        8-connected components of a binary image (union-find)
//   min_area_rect   rotating-calipers minimum-area rectangle of the point set
//   fill_convex_quad  scanline fill of a (convex) quadrilateral
//
// Build: g++ -O3 -shared -fPIC geometry.cpp -o libhv_geometry.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- cc_label
// labels: out int32 array (h*w), returns number of components (labels 1..n).
int cc_label(const uint8_t* img, int h, int w, int32_t* labels) {
    std::vector<int32_t> parent(1, 0);
    auto find = [&](int32_t x) {
        while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
        return x;
    };
    auto unite = [&](int32_t a, int32_t b) {
        a = find(a); b = find(b);
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
    };

    std::memset(labels, 0, sizeof(int32_t) * h * w);
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            if (!img[y * w + x]) continue;
            // neighbors already visited in raster order (8-connectivity)
            int32_t best = 0;
            int32_t neigh[4] = {0, 0, 0, 0};
            int n = 0;
            if (y > 0) {
                if (x > 0) neigh[n++] = labels[(y - 1) * w + x - 1];
                neigh[n++] = labels[(y - 1) * w + x];
                if (x + 1 < w) neigh[n++] = labels[(y - 1) * w + x + 1];
            }
            if (x > 0) neigh[n++] = labels[y * w + x - 1];
            for (int i = 0; i < n; ++i)
                if (neigh[i] && (!best || neigh[i] < best)) best = neigh[i];
            if (!best) {
                int32_t fresh = (int32_t)parent.size();
                parent.push_back(fresh);
                labels[y * w + x] = fresh;
            } else {
                labels[y * w + x] = best;
                for (int i = 0; i < n; ++i)
                    if (neigh[i]) unite(neigh[i], best);
            }
        }
    }
    // flatten + compact labels
    std::vector<int32_t> remap(parent.size(), 0);
    int32_t next = 0;
    for (int i = 0; i < h * w; ++i) {
        if (!labels[i]) continue;
        int32_t r = find(labels[i]);
        if (!remap[r]) remap[r] = ++next;
        labels[i] = remap[r];
    }
    return next;
}

// ------------------------------------------------------------ convex hull
// Andrew monotone chain on integer points; used by min_area_rect.
static int convex_hull(const double* xs, const double* ys, int n,
                       std::vector<double>& hx, std::vector<double>& hy) {
    std::vector<int> idx(n);
    for (int i = 0; i < n; ++i) idx[i] = i;
    std::sort(idx.begin(), idx.end(), [&](int a, int b) {
        return xs[a] < xs[b] || (xs[a] == xs[b] && ys[a] < ys[b]);
    });
    auto cross = [&](int o, int a, int b) {
        return (xs[a] - xs[o]) * (ys[b] - ys[o]) - (ys[a] - ys[o]) * (xs[b] - xs[o]);
    };
    std::vector<int> hull(2 * n);
    int k = 0;
    for (int ii = 0; ii < n; ++ii) {
        int i = idx[ii];
        while (k >= 2 && cross(hull[k - 2], hull[k - 1], i) <= 0) --k;
        hull[k++] = i;
    }
    for (int ii = n - 2, lower = k + 1; ii >= 0; --ii) {
        int i = idx[ii];
        while (k >= lower && cross(hull[k - 2], hull[k - 1], i) <= 0) --k;
        hull[k++] = i;
    }
    k = std::max(k - 1, 1);
    hx.resize(k); hy.resize(k);
    for (int i = 0; i < k; ++i) { hx[i] = xs[hull[i]]; hy[i] = ys[hull[i]]; }
    return k;
}

// --------------------------------------------------------- min_area_rect
// Input: n points (xs, ys). Output: 8 doubles = 4 corners (x, y) of the
// minimum-area enclosing rectangle, plus center (cx, cy) in out[8..9].
void min_area_rect(const double* xs, const double* ys, int n, double* out) {
    if (n <= 0) {  // empty input: all-zero rect (callers treat as no-op)
        for (int i = 0; i < 10; ++i) out[i] = 0.0;
        return;
    }
    std::vector<double> hx, hy;
    int k = convex_hull(xs, ys, n, hx, hy);
    if (k == 1) {  // degenerate: single point
        for (int i = 0; i < 4; ++i) { out[2 * i] = hx[0]; out[2 * i + 1] = hy[0]; }
        out[8] = hx[0]; out[9] = hy[0];
        return;
    }
    double best_area = 1e300;
    double bc[8] = {0}, bcx = 0, bcy = 0;
    for (int i = 0; i < k; ++i) {
        int j = (i + 1) % k;
        double ex = hx[j] - hx[i], ey = hy[j] - hy[i];
        double len = std::hypot(ex, ey);
        if (len < 1e-12) continue;
        ex /= len; ey /= len;
        double nx = -ey, ny = ex;
        double mn_e = 1e300, mx_e = -1e300, mn_n = 1e300, mx_n = -1e300;
        for (int p = 0; p < k; ++p) {
            double pe = hx[p] * ex + hy[p] * ey;
            double pn = hx[p] * nx + hy[p] * ny;
            mn_e = std::min(mn_e, pe); mx_e = std::max(mx_e, pe);
            mn_n = std::min(mn_n, pn); mx_n = std::max(mx_n, pn);
        }
        double area = (mx_e - mn_e) * (mx_n - mn_n);
        if (area < best_area) {
            best_area = area;
            double corners[4][2] = {
                {mn_e, mn_n}, {mx_e, mn_n}, {mx_e, mx_n}, {mn_e, mx_n}};
            for (int c = 0; c < 4; ++c) {
                bc[2 * c] = corners[c][0] * ex + corners[c][1] * nx;
                bc[2 * c + 1] = corners[c][0] * ey + corners[c][1] * ny;
            }
            bcx = 0.5 * (mn_e + mx_e) * ex + 0.5 * (mn_n + mx_n) * nx;
            bcy = 0.5 * (mn_e + mx_e) * ey + 0.5 * (mn_n + mx_n) * ny;
        }
    }
    if (best_area >= 1e300) {
        // every hull edge was degenerate (e.g. n duplicate identical
        // points -> a 2-identical-point hull): fall back to the axis-
        // aligned bbox of the hull instead of returning the zero rect
        double mnx = hx[0], mxx = hx[0], mny = hy[0], mxy = hy[0];
        for (int p = 1; p < k; ++p) {
            mnx = std::min(mnx, hx[p]); mxx = std::max(mxx, hx[p]);
            mny = std::min(mny, hy[p]); mxy = std::max(mxy, hy[p]);
        }
        double corners[4][2] = {{mnx, mny}, {mxx, mny}, {mxx, mxy}, {mnx, mxy}};
        for (int c = 0; c < 4; ++c) {
            out[2 * c] = corners[c][0];
            out[2 * c + 1] = corners[c][1];
        }
        out[8] = 0.5 * (mnx + mxx); out[9] = 0.5 * (mny + mxy);
        return;
    }
    std::memcpy(out, bc, sizeof(bc));
    out[8] = bcx; out[9] = bcy;
}

// ------------------------------------------------------ fill_convex_quad
// Rasterize a convex quadrilateral (4 corners, already scaled/rounded by the
// caller) into a (h, w) uint8 image with `value`. Scanline algorithm with
// inclusive integer bounds, matching cv2.fillPoly's pixel coverage closely.
void fill_convex_quad(const int32_t* corners_xy, int h, int w,
                      uint8_t value, uint8_t* img) {
    double px[4], py[4];
    for (int i = 0; i < 4; ++i) { px[i] = corners_xy[2 * i]; py[i] = corners_xy[2 * i + 1]; }
    int y0 = (int)std::floor(*std::min_element(py, py + 4));
    int y1 = (int)std::ceil(*std::max_element(py, py + 4));
    y0 = std::max(y0, 0); y1 = std::min(y1, h - 1);
    for (int y = y0; y <= y1; ++y) {
        double xmin = 1e300, xmax = -1e300;
        for (int i = 0; i < 4; ++i) {
            int j = (i + 1) % 4;
            double ay = py[i], by = py[j];
            if ((y < std::min(ay, by)) || (y > std::max(ay, by))) continue;
            double ax = px[i], bx = px[j];
            double x;
            if (std::abs(by - ay) < 1e-12) {
                xmin = std::min({xmin, ax, bx});
                xmax = std::max({xmax, ax, bx});
                continue;
            }
            x = ax + (bx - ax) * (y - ay) / (by - ay);
            xmin = std::min(xmin, x);
            xmax = std::max(xmax, x);
        }
        if (xmax < xmin) continue;
        // round both ends: empirically closest to cv2.fillPoly coverage
        int xa = std::max((int)std::lround(xmin), 0);
        int xb = std::min((int)std::lround(xmax), w - 1);
        for (int x = xa; x <= xb; ++x) img[y * w + x] = value;
    }
}

}  // extern "C"
