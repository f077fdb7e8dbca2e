// Host-side connected-components / blob filtering (C ABI, ctypes-loaded).
//
// Native counterpart of openglottal_tpu/ops/blobs.py with identical
// topological semantics: foreground 8-connectivity, background
// 4-connectivity, per-component hole filling (nested components absorbed,
// jointly-enclosed pockets left open), top-n ranking by foreground pixel
// count.  Used as the host fallback / oracle for the device kernel and by
// host-side tooling that operates on masks outside jit (overlay drawing,
// dataset preparation).
//
// Build: make -C native   (produces native/libblobs.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct DSU {
    std::vector<int32_t> parent;
    explicit DSU(size_t n) : parent(n) {
        for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
    }
    int32_t find(int32_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    }
    void unite(int32_t a, int32_t b) {
        a = find(a); b = find(b);
        if (a == b) return;
        if (a > b) std::swap(a, b);  // keep min index as root (device parity)
        parent[b] = a;
    }
};

// Label connected components; fg selects the polarity.  conn8 toggles
// 8-connectivity (foreground) vs 4 (background).  Background of the
// selected polarity gets label == hw.
void label_cc(const uint8_t* mask, int h, int w, bool fg, bool conn8,
              int32_t* out) {
    const int hw = h * w;
    DSU dsu(hw);
    auto on = [&](int i) { return (mask[i] != 0) == fg; };
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            const int i = y * w + x;
            if (!on(i)) continue;
            if (x > 0 && on(i - 1)) dsu.unite(i, i - 1);
            if (y > 0 && on(i - w)) dsu.unite(i, i - w);
            if (conn8 && y > 0) {
                if (x > 0 && on(i - w - 1)) dsu.unite(i, i - w - 1);
                if (x + 1 < w && on(i - w + 1)) dsu.unite(i, i - w + 1);
            }
        }
    }
    for (int i = 0; i < hw; ++i) out[i] = on(i) ? dsu.find(i) : hw;
}

}  // namespace

extern "C" {

// Label 8-connected foreground components (root = min flat index; bg = h*w).
void og_connected_components(const uint8_t* mask, int h, int w, int32_t* labels) {
    label_cc(mask, h, w, /*fg=*/true, /*conn8=*/true, labels);
}

// Keep the n largest blobs (topological FILLED semantics). out is 0/1 uint8.
void og_top_n_blobs(const uint8_t* mask, int h, int w, int n, uint8_t* out) {
    const int hw = h * w;
    std::vector<int32_t> labF(hw), labB(hw);
    label_cc(mask, h, w, true, true, labF.data());
    label_cc(mask, h, w, false, false, labB.data());

    // parent pointers via the topmost-root trick (see ops/blobs.py docstring)
    std::vector<int32_t> fg_parent(hw + 1, hw), bg_parent(hw + 1, hw);
    std::vector<uint8_t> outside(hw + 1, 0), viol(hw + 1, 0);
    outside[hw] = 1;
    for (int i = 0; i < hw; ++i) {
        if (labB[i] == i) fg_parent[i] = (i >= w) ? labF[i - w] : hw;
        if (labF[i] == i) bg_parent[i] = (i >= w) ? labB[i - w] : hw;
    }
    for (int x = 0; x < w; ++x) {
        outside[labB[x]] = 1;
        outside[labB[(h - 1) * w + x]] = 1;
    }
    for (int y = 0; y < h; ++y) {
        outside[labB[y * w]] = 1;
        outside[labB[y * w + w - 1]] = 1;
    }
    // violation: bg comp H touching (8-adj) a fg comp that is neither H's
    // encloser nor nested inside H => pocket, not a hole
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            const int i = y * w + x;
            if (mask[i]) continue;
            const int32_t H = labB[i];
            const int32_t encl = fg_parent[H];
            for (int dy = -1; dy <= 1; ++dy) {
                for (int dx = -1; dx <= 1; ++dx) {
                    if (!dy && !dx) continue;
                    const int ny = y + dy, nx = x + dx;
                    if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
                    const int j = ny * w + nx;
                    if (!mask[j]) continue;
                    const int32_t X = labF[j];
                    if (X != encl && bg_parent[X] != H) viol[H] = 1;
                }
            }
        }
    }
    std::vector<uint8_t> hole(hw + 1, 0);
    for (int i = 0; i <= hw; ++i)
        hole[i] = !outside[i] && !viol[i] && fg_parent[i] != hw;

    // absorb-root chase for nested comps (depth <= 4 in practice)
    std::vector<int32_t> rootF(hw + 1);
    for (int i = 0; i <= hw; ++i) rootF[i] = i;
    for (int it = 0; it < 4; ++it)
        for (int i = 0; i <= hw; ++i) {
            const int32_t b = bg_parent[rootF[i]];
            if (b != hw && hole[b]) rootF[i] = fg_parent[b];
        }

    std::vector<int64_t> counts(hw + 1, 0);
    for (int i = 0; i < hw; ++i)
        if (mask[i]) counts[rootF[labF[i]]] += 1;
    counts[hw] = 0;

    std::vector<int32_t> ids;
    for (int i = 0; i < hw; ++i)
        if (counts[i] > 0) ids.push_back(i);
    std::partial_sort(ids.begin(),
                      ids.begin() + std::min<size_t>(n, ids.size()), ids.end(),
                      [&](int32_t a, int32_t b) {
                          return counts[a] != counts[b] ? counts[a] > counts[b]
                                                        : a < b;
                      });
    std::vector<uint8_t> keep(hw + 1, 0);
    for (size_t k = 0; k < std::min<size_t>(n, ids.size()); ++k)
        keep[ids[k]] = 1;

    std::memset(out, 0, hw);
    for (int i = 0; i < hw; ++i) {
        if (mask[i]) {
            out[i] = keep[rootF[labF[i]]];
        } else {
            const int32_t H = labB[i];
            if (hole[H]) {
                const int32_t owner = rootF[fg_parent[H]];
                out[i] = keep[owner];
            }
        }
    }
}

// Exact masked uint8 percentile (np.percentile linear interpolation),
// matching ops/histogram.py; returns fallback when the mask is empty.
double og_masked_percentile_u8(const uint8_t* values, const uint8_t* mask,
                               int n, double q, double fallback) {
    int64_t hist[256] = {0};
    int64_t cnt = 0;
    for (int i = 0; i < n; ++i)
        if (mask[i]) { ++hist[values[i]]; ++cnt; }
    if (cnt == 0) return fallback;
    const double rank = (q / 100.0) * (cnt - 1);
    const int64_t k = static_cast<int64_t>(rank);
    const double frac = rank - k;
    int64_t cum = 0;
    int v_lo = 255, v_hi = 255;
    for (int v = 0; v < 256; ++v) {
        cum += hist[v];
        if (cum > k) { v_lo = v; break; }
    }
    cum = 0;
    for (int v = 0; v < 256; ++v) {
        cum += hist[v];
        if (cum > k + 1) { v_hi = v; break; }
    }
    return v_lo * (1.0 - frac) + v_hi * frac;
}

}  // extern "C"
