// gpb_native: native runtime components for gpboost_tpu.
//
// TPU-native equivalent of the reference's C++ IO layer (src/LightGBM/io/
// dataset_loader.cpp, parser.cpp, bin.cpp): CSV parsing and feature
// quantization run natively on the host, producing the static arrays the
// device kernels consume. Exposed as a plain C ABI consumed via ctypes
// (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libgpb_native.so gpb_native.cpp

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <cctype>
#include <vector>
#include <string>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Fast CSV reader: numeric rectangular files, '?'/''/nan -> NaN.
// Returns 0 on success; *out is malloc'd row-major (n_rows x n_cols).
int gpb_read_csv(const char* path, char sep, int has_header,
                 double** out, long long* n_rows, int* n_cols) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return -2; }
    fclose(f);
    buf[size] = '\0';

    char* p = buf.data();
    char* end = p + size;
    if (has_header) {
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }
    // count columns from the first data line
    int cols = 1;
    for (char* q = p; q < end && *q != '\n'; ++q)
        if (*q == sep) ++cols;
    std::vector<double> data;
    data.reserve(1 << 20);
    long long rows = 0;
    while (p < end) {
        if (*p == '\n' || *p == '\r') { ++p; continue; }
        int c = 0;
        while (p < end && *p != '\n') {
            // parse one field
            char* field_start = p;
            while (p < end && *p != sep && *p != '\n' && *p != '\r') ++p;
            char saved = *p;
            *p = '\0';
            double v;
            if (field_start == p || strcmp(field_start, "?") == 0 ||
                strcmp(field_start, "NA") == 0 || strcmp(field_start, "nan") == 0) {
                v = NAN;
            } else {
                char* endp;
                v = strtod(field_start, &endp);
                if (endp == field_start) v = NAN;
            }
            *p = saved;
            data.push_back(v);
            ++c;
            if (p < end && *p == sep) ++p;
        }
        while (p < end && (*p == '\n' || *p == '\r')) ++p;
        if (c != cols) {
            // ragged line: pad with NaN
            for (; c < cols; ++c) data.push_back(NAN);
        }
        ++rows;
    }
    double* res = (double*)malloc(sizeof(double) * data.size());
    if (!res) return -3;
    memcpy(res, data.data(), sizeof(double) * data.size());
    *out = res;
    *n_rows = rows;
    *n_cols = cols;
    return 0;
}

void gpb_free(double* ptr) { free(ptr); }

// ---------------------------------------------------------------------------
// Feature quantization (bin.cpp FindBin/Bin::ValueToBin semantics):
// bin = index of first upper bound >= value (binary search); NaN -> nan_bin.
void gpb_bin_column(const double* vals, long long n, const double* uppers,
                    int n_uppers, int nan_bin, int* out) {
    for (long long i = 0; i < n; ++i) {
        double v = vals[i];
        if (std::isnan(v)) {
            out[i] = nan_bin >= 0 ? nan_bin : 0;
            continue;
        }
        int lo = 0, hi = n_uppers - 1;   // last bound is +inf
        while (lo < hi) {
            int mid = (lo + hi) >> 1;
            if (v <= uppers[mid]) hi = mid; else lo = mid + 1;
        }
        out[i] = lo;
    }
}

// Quantile cut-point search on sorted distinct values with counts
// (simplified greedy equal-frequency binning).
int gpb_find_bin_bounds(const double* sorted_vals, long long n, int max_bin,
                        double* uppers_out, int* n_uppers_out) {
    if (n == 0) { *n_uppers_out = 1; uppers_out[0] = INFINITY; return 0; }
    // distinct values
    std::vector<double> uniq;
    uniq.reserve(std::min<long long>(n, 1 << 20));
    for (long long i = 0; i < n; ++i)
        if (i == 0 || sorted_vals[i] != sorted_vals[i - 1])
            uniq.push_back(sorted_vals[i]);
    long long nu = (long long)uniq.size();
    if (nu <= max_bin) {
        for (long long i = 0; i + 1 < nu; ++i)
            uppers_out[i] = (uniq[i] + uniq[i + 1]) / 2.0;
        uppers_out[nu - 1] = INFINITY;
        *n_uppers_out = (int)nu;
        return 0;
    }
    // equal-frequency on the raw (with duplicates) array
    for (int b = 0; b + 1 < max_bin; ++b) {
        long long idx = (long long)((double)(b + 1) / max_bin * (n - 1));
        uppers_out[b] = sorted_vals[idx];
    }
    uppers_out[max_bin - 1] = INFINITY;
    // dedupe
    int k = 0;
    for (int b = 0; b < max_bin; ++b)
        if (b == 0 || uppers_out[b] != uppers_out[k - 1])
            uppers_out[k++] = uppers_out[b];
    *n_uppers_out = k;
    return 0;
}

// ---------------------------------------------------------------------------
// Nearest preceding neighbors for the Vecchia ordering on a 2-D grid index
// (Vecchia_utils.h fast heuristic analogue). Cell-bucketed search: points
// hashed into a uniform grid; candidate rings expanded until m preceding
// neighbors are found. Exact for the returned set under ring expansion.
void gpb_nn_preceding_2d(const double* coords, long long n, int m,
                         long long* idx_out, unsigned char* mask_out) {
    double minx = INFINITY, maxx = -INFINITY, miny = INFINITY, maxy = -INFINITY;
    for (long long i = 0; i < n; ++i) {
        minx = std::min(minx, coords[2 * i]);
        maxx = std::max(maxx, coords[2 * i]);
        miny = std::min(miny, coords[2 * i + 1]);
        maxy = std::max(maxy, coords[2 * i + 1]);
    }
    int G = (int)std::max(1.0, std::sqrt((double)n / 4.0));
    double sx = (maxx - minx) / G + 1e-300, sy = (maxy - miny) / G + 1e-300;
    std::vector<std::vector<long long>> cells((size_t)G * G);
    auto cell_of = [&](long long i) {
        int cx = std::min(G - 1, (int)((coords[2 * i] - minx) / sx));
        int cy = std::min(G - 1, (int)((coords[2 * i + 1] - miny) / sy));
        return (size_t)cx * G + cy;
    };
    std::vector<std::pair<double, long long>> cand;
    for (long long i = 0; i < n; ++i) {
        // collect >= m preceding candidates by expanding rings
        int cx = std::min(G - 1, (int)((coords[2 * i] - minx) / sx));
        int cy = std::min(G - 1, (int)((coords[2 * i + 1] - miny) / sy));
        cand.clear();
        long long want = std::min<long long>(m, i);
        for (int r = 0; r < G && (long long)cand.size() < 4 * want + 8; ++r) {
            for (int dx = -r; dx <= r; ++dx) {
                for (int dy = -r; dy <= r; ++dy) {
                    if (std::max(std::abs(dx), std::abs(dy)) != r) continue;
                    int x = cx + dx, y = cy + dy;
                    if (x < 0 || y < 0 || x >= G || y >= G) continue;
                    for (long long j : cells[(size_t)x * G + y]) {
                        double ddx = coords[2 * i] - coords[2 * j];
                        double ddy = coords[2 * i + 1] - coords[2 * j + 1];
                        cand.push_back({ddx * ddx + ddy * ddy, j});
                    }
                }
            }
            if (r > 2 && (long long)cand.size() >= want) break;
        }
        long long k = std::min<long long>(want, (long long)cand.size());
        std::partial_sort(cand.begin(), cand.begin() + k, cand.end());
        for (long long t = 0; t < m; ++t) {
            if (t < k) {
                idx_out[i * m + t] = cand[t].second;
                mask_out[i * m + t] = 1;
            } else {
                idx_out[i * m + t] = i;
                mask_out[i * m + t] = 0;
            }
        }
        cells[cell_of(i)].push_back(i);
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// TreeSHAP: exact Shapley value feature attributions for one decision tree
// (polynomial-time algorithm of Lundberg et al. 2018; the reference exposes
// this as Booster.predict(..., pred_contrib=True) via LightGBM's
// src/treelearner/../treeshap code path).
// Trees are the package's flat arrays: split_feature/threshold/left/right/
// is_leaf/leaf_value plus per-node training covers.
// ---------------------------------------------------------------------------

namespace {

struct PathElem {
    int feature_index;
    double zero_fraction;
    double one_fraction;
    double pweight;
};

void extend_path(PathElem* up, int ud, double zf, double of, int fi) {
    up[ud].feature_index = fi;
    up[ud].zero_fraction = zf;
    up[ud].one_fraction = of;
    up[ud].pweight = (ud == 0) ? 1.0 : 0.0;
    for (int i = ud - 1; i >= 0; --i) {
        up[i + 1].pweight += of * up[i].pweight * (i + 1) / (double)(ud + 1);
        up[i].pweight = zf * up[i].pweight * (ud - i) / (double)(ud + 1);
    }
}

void unwind_path(PathElem* up, int ud, int pi) {
    const double of = up[pi].one_fraction;
    const double zf = up[pi].zero_fraction;
    double next_one = up[ud].pweight;
    for (int i = ud - 1; i >= 0; --i) {
        if (of != 0.0) {
            const double tmp = up[i].pweight;
            up[i].pweight = next_one * (ud + 1) / (double)((i + 1) * of);
            next_one = tmp - up[i].pweight * zf * (ud - i) / (double)(ud + 1);
        } else {
            up[i].pweight = up[i].pweight * (ud + 1)
                / (double)(zf * (ud - i));
        }
    }
    for (int i = pi; i < ud; ++i) {
        up[i].feature_index = up[i + 1].feature_index;
        up[i].zero_fraction = up[i + 1].zero_fraction;
        up[i].one_fraction = up[i + 1].one_fraction;
    }
}

double unwound_path_sum(const PathElem* up, int ud, int pi) {
    const double of = up[pi].one_fraction;
    const double zf = up[pi].zero_fraction;
    double next_one = up[ud].pweight;
    double total = 0.0;
    for (int i = ud - 1; i >= 0; --i) {
        if (of != 0.0) {
            const double tmp = next_one * (ud + 1) / (double)((i + 1) * of);
            total += tmp;
            next_one = up[i].pweight
                - tmp * zf * ((ud - i) / (double)(ud + 1));
        } else {
            total += (up[i].pweight / zf)
                / ((ud - i) / (double)(ud + 1));
        }
    }
    return total;
}

struct TreeArrays {
    const int* split_feature;
    const double* threshold;
    const int* lc;
    const int* rc;
    const unsigned char* is_leaf;
    const double* leaf_value;
    const double* cover;
    const unsigned char* default_left;  // missing-value routing per node
};

void shap_recurse(const TreeArrays& t, const double* x, double* phi,
                  int node, int ud, PathElem* parent_path,
                  double pzf, double pof, int pfi) {
    PathElem* up = parent_path + ud + 1;
    std::copy(parent_path, parent_path + ud + 1, up);
    extend_path(up, ud, pzf, pof, pfi);
    if (t.is_leaf[node]) {
        for (int i = 1; i <= ud; ++i) {
            const double w = unwound_path_sum(up, ud, i);
            phi[up[i].feature_index] +=
                w * (up[i].one_fraction - up[i].zero_fraction)
                * t.leaf_value[node];
        }
        return;
    }
    const int f = t.split_feature[node];
    const double xv = x[f];
    // missing follows the split's learned default direction
    // (Tree.default_left), finite values the threshold
    const bool go_left = (xv == xv) ? (xv <= t.threshold[node])
                                    : (t.default_left[node] != 0);
    const int hot = go_left ? t.lc[node] : t.rc[node];
    const int cold = go_left ? t.rc[node] : t.lc[node];
    const double w = t.cover[node];
    const double hot_zf = t.cover[hot] / w;
    const double cold_zf = t.cover[cold] / w;
    double izf = 1.0, iof = 1.0;
    int pi = 0;
    for (; pi <= ud; ++pi)
        if (up[pi].feature_index == f) break;
    if (pi != ud + 1) {
        izf = up[pi].zero_fraction;
        iof = up[pi].one_fraction;
        unwind_path(up, ud, pi);
        ud -= 1;
    }
    shap_recurse(t, x, phi, hot, ud + 1, up, hot_zf * izf, iof, f);
    shap_recurse(t, x, phi, cold, ud + 1, up, cold_zf * izf, 0.0, f);
}

double tree_expected_value(const TreeArrays& t, int node) {
    if (t.is_leaf[node]) return t.leaf_value[node];
    const int l = t.lc[node], r = t.rc[node];
    return (t.cover[l] * tree_expected_value(t, l)
            + t.cover[r] * tree_expected_value(t, r)) / t.cover[node];
}

int tree_max_depth(const TreeArrays& t, int node) {
    if (t.is_leaf[node]) return 1;
    const int l = tree_max_depth(t, t.lc[node]);
    const int r = tree_max_depth(t, t.rc[node]);
    return 1 + (l > r ? l : r);
}

}  // namespace

extern "C" {

// Accumulate one tree's SHAP values into phi (n, p+1) row-major; the last
// column receives the tree's expected value (bias term).
void gpb_tree_shap(const int* split_feature, const double* threshold,
                   const int* lc, const int* rc, const unsigned char* is_leaf,
                   const double* leaf_value, const double* cover,
                   const unsigned char* default_left,
                   const double* X, long long n, int p, double* phi) {
    TreeArrays t{split_feature, threshold, lc, rc, is_leaf, leaf_value,
                 cover, default_left};
    const double expected = tree_expected_value(t, 0);
    const int D = tree_max_depth(t, 0) + 2;
    std::vector<PathElem> buf((size_t)D * (D + 1));
    for (long long i = 0; i < n; ++i) {
        double* phi_row = phi + i * (p + 1);
        phi_row[p] += expected;
        shap_recurse(t, X + i * p, phi_row, 0, 0, buf.data(), 1.0, 1.0, -1);
    }
}

}  // extern "C"
