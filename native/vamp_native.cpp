// Native host-side hot paths: pointcloud filters and CAPT build.
//
// The planning/collision compute path of this framework is XLA/Pallas on the
// TPU; these host-side preprocessing steps (pointcloud filtering and
// tree/table construction, reference src/impl/vamp/collision/filter.hh,
// filter_centervox.hh, capt.hh) are latency-sensitive CPU work that the
// reference implements in C++ — so do we.  Exposed as a C ABI consumed via
// ctypes (vamp_mvt_tpu/native.py); the Python/numpy implementations remain as
// the portable fallback and the semantic reference for tests.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

inline float sq(float x) { return x * x; }

inline uint32_t morton3(uint32_t x, uint32_t y, uint32_t z) {
    // interleave 10-bit coordinates, x in the lowest bit
    uint32_t out = 0;
    for (int b = 0; b < 10; ++b) {
        out |= ((x >> b) & 1u) << (3 * b);
        out |= ((y >> b) & 1u) << (3 * b + 1);
        out |= ((z >> b) & 1u) << (3 * b + 2);
    }
    return out;
}

}  // namespace

extern "C" {

// SCDF: space-filling-curve distance filter.  Returns the kept count; kept
// input indices are written to out_idx (capacity n).  Semantics match
// vamp_mvt_tpu/pointcloud/filters.py::filter_scdf (reference filter.hh:175-275):
// range/workspace cull, then one pass per axis permutation in lexicographic
// order: sort by Morton code of the remapped permuted coordinates, drop points
// within min_dist of the previously-kept point, halve the remap window toward
// the data extent.
int vamp_scdf_filter(const float* pts, int n, float min_dist, float max_range,
                     const float* origin, const float* wmin, const float* wmax,
                     int cull, int* out_idx) {
    if (n <= 0) return 0;
    const float sqdist = min_dist * min_dist;
    const float sqrange = max_range * max_range;
    float lo = std::min({origin[0] - max_range, origin[1] - max_range,
                         origin[2] - max_range});
    float hi = std::min({origin[0] + max_range, origin[1] + max_range,
                         origin[2] + max_range});

    std::vector<uint32_t> idx;
    idx.reserve(n);
    for (int i = 0; i < n; ++i) {
        const float* p = pts + 3 * i;
        if (cull) {
            const float d2 = sq(p[0] - origin[0]) + sq(p[1] - origin[1]) +
                             sq(p[2] - origin[2]);
            if (d2 >= sqrange) continue;
            bool in = true;
            for (int k = 0; k < 3; ++k)
                in = in && p[k] >= wmin[k] && p[k] <= wmax[k];
            if (!in) continue;
        }
        idx.push_back(i);
    }
    if (idx.empty()) return 0;

    int perm[3] = {0, 1, 2};
    std::vector<std::pair<uint32_t, uint32_t>> keyed;
    do {
        keyed.clear();
        keyed.reserve(idx.size());
        float new_lo = hi, new_hi = lo;
        const float scale = 1000.0f / (hi - lo);
        for (uint32_t id : idx) {
            const float* p = pts + 3 * id;
            const uint32_t c0 = (uint32_t)((p[perm[0]] - lo) * scale);
            const uint32_t c1 = (uint32_t)((p[perm[1]] - lo) * scale);
            const uint32_t c2 = (uint32_t)((p[perm[2]] - lo) * scale);
            for (int k = 0; k < 3; ++k) {
                new_lo = std::min(new_lo, p[k]);
                new_hi = std::max(new_hi, p[k]);
            }
            keyed.emplace_back(morton3(c0, c1, c2), id);
        }
        // stable LSD radix sort on the 30-bit Morton key (3 x 10-bit
        // passes): same order as stable_sort, ~4x faster at filter sizes
        {
            static thread_local std::vector<std::pair<uint32_t, uint32_t>> tmp;
            tmp.resize(keyed.size());
            uint32_t cnt[1024];
            auto* src = &keyed;
            auto* dst = &tmp;
            for (int shift = 0; shift < 30; shift += 10) {
                std::memset(cnt, 0, sizeof(cnt));
                for (const auto& kv : *src) ++cnt[(kv.first >> shift) & 1023];
                uint32_t run = 0;
                for (int b = 0; b < 1024; ++b) {
                    const uint32_t c = cnt[b];
                    cnt[b] = run;
                    run += c;
                }
                for (const auto& kv : *src)
                    (*dst)[cnt[(kv.first >> shift) & 1023]++] = kv;
                std::swap(src, dst);
            }
            if (src != &keyed) keyed.swap(tmp);
        }
        idx.clear();
        const float* last = pts + 3 * keyed.front().second;
        idx.push_back(keyed.front().second);
        for (size_t i = 1; i < keyed.size(); ++i) {
            const float* p = pts + 3 * keyed[i].second;
            const float d2 =
                sq(p[0] - last[0]) + sq(p[1] - last[1]) + sq(p[2] - last[2]);
            if (d2 > sqdist) {
                idx.push_back(keyed[i].second);
                last = p;
            }
        }
        hi = (new_hi + hi) / 2.0f;
        lo = (new_lo + lo) / 2.0f;
    } while (std::next_permutation(perm, perm + 3));

    std::memcpy(out_idx, idx.data(), idx.size() * sizeof(int));
    return (int)idx.size();
}

// Center-selective voxel filter: keep, per voxel, the point nearest the voxel
// center (reference filter_centervox.hh); output in voxel first-occurrence
// order.  Matches filters.py::filter_centervox.
int vamp_centervox_filter(const float* pts, int n, float voxel_size,
                          float max_range, const float* origin,
                          const float* wmin, const float* wmax, int* out_idx) {
    if (n <= 0) return 0;
    const float ww = std::max({wmax[0] - wmin[0], wmax[1] - wmin[1],
                               wmax[2] - wmin[2]});
    const int grid_width =
        std::min(255, (int)std::ceil(ww / voxel_size));
    const float inv_scale = grid_width / ww;
    const float sqrange = max_range * max_range;

    std::vector<int> win_map;  // packed voxel key -> index into wins, -1 = none
    win_map.assign((size_t)grid_width * grid_width * grid_width, -1);
    struct Win {
        int idx;
        float d2;
    };
    std::vector<Win> wins;
    std::vector<int> key_order;
    wins.reserve(4096);
    key_order.reserve(4096);

    for (int i = 0; i < n; ++i) {
        const float* p = pts + 3 * i;
        const float dr2 = sq(p[0] - origin[0]) + sq(p[1] - origin[1]) +
                          sq(p[2] - origin[2]);
        if (dr2 >= sqrange) continue;
        bool in = true;
        for (int k = 0; k < 3; ++k) in = in && p[k] >= wmin[k] && p[k] <= wmax[k];
        if (!in) continue;
        int v[3];
        for (int k = 0; k < 3; ++k) {
            int c = (int)((p[k] - wmin[k]) * inv_scale);
            v[k] = std::min(std::max(c, 0), 254);
        }
        const size_t key = ((size_t)v[0] * grid_width + v[1]) * grid_width + v[2];
        if (key >= win_map.size()) continue;
        const float cx = wmin[0] + (v[0] + 0.5f) * voxel_size;
        const float cy = wmin[1] + (v[1] + 0.5f) * voxel_size;
        const float cz = wmin[2] + (v[2] + 0.5f) * voxel_size;
        const float d2 = sq(p[0] - cx) + sq(p[1] - cy) + sq(p[2] - cz);
        int w = win_map[key];
        if (w < 0) {
            win_map[key] = (int)wins.size();
            wins.push_back({i, d2});
            key_order.push_back((int)key);
        } else if (d2 < wins[w].d2) {
            wins[w] = {i, d2};
        }
    }
    for (size_t k = 0; k < key_order.size(); ++k) out_idx[k] = wins[k].idx;
    return (int)key_order.size();
}

// CAPT build: recursive median-split kd-tree with per-leaf affordance buffers.
// Outputs (all caller-allocated):
//   tests       (size-1,)        split planes (size = next pow2 of n)
//   leaf_aabb   (size, 6)        per-leaf AABB (+inf for empty leaves)
//   aff_flat    (aff_cap, 3)     concatenated affordance points
//   aff_start   (size+1,)        per-leaf slice starts into aff_flat
// Returns total affordance count, or -1 if aff_cap was insufficient.
// Matches vamp_mvt_tpu/collision/capt.py::build_capt (reference capt.hh with
// the corrected sibling boundary-candidate scan).
int vamp_capt_build(const float* pts_in, int n, float r_min, float r_max,
                    float r_point, float* tests, float* leaf_aabb,
                    float* aff_flat, int aff_cap, int* aff_start,
                    float* top_aabb) {
    int nlog2 = 0;
    while ((1 << nlog2) < n) nlog2++;
    const int size = 1 << nlog2;
    const float INF = std::numeric_limits<float>::infinity();

    std::vector<std::array<float, 3>> pts(size, {INF, INF, INF});
    for (int i = 0; i < n; ++i)
        pts[i] = {pts_in[3 * i], pts_in[3 * i + 1], pts_in[3 * i + 2]};

    const float max_aff_l2 = sq(r_max + r_point);
    const float min_aff_l2 = sq(r_min + r_point);

    std::vector<uint32_t> argsort(size);
    std::iota(argsort.begin(), argsort.end(), 0u);
    for (int i = 0; i < size - 1; ++i) tests[i] = NAN;
    for (int k = 0; k < 3; ++k) {
        top_aabb[k] = INF;
        top_aabb[3 + k] = -INF;
    }

    int leaf_counter = 0;
    int aff_total = 0;
    bool overflow = false;
    aff_start[0] = 0;

    struct Frame {
        int begin, count, i, d;
        std::array<float, 3> vlo, vhi;
        std::vector<uint32_t> afford;
    };
    std::vector<Frame> stack;
    stack.push_back({0, size, 0, 0,
                     {-INF, -INF, -INF},
                     {INF, INF, INF},
                     {}});

    auto distsq_to = [](const std::array<float, 3>& lo,
                        const std::array<float, 3>& hi,
                        const std::array<float, 3>& p) {
        float acc = 0.0f;
        for (int k = 0; k < 3; ++k) {
            const float c = std::min(std::max(p[k], lo[k]), hi[k]);
            acc += sq(p[k] - c);
        }
        return acc;
    };

    // iterative DFS, left child first (matches the recursion's leaf order)
    while (!stack.empty()) {
        Frame fr = std::move(stack.back());
        stack.pop_back();
        if (fr.count == 1) {
            const int z = leaf_counter++;
            const auto& rep = pts[argsort[fr.begin]];
            float* aabb = leaf_aabb + 6 * z;
            if (std::isfinite(rep[0])) {
                for (int k = 0; k < 3; ++k) {
                    aabb[k] = rep[k];
                    aabb[3 + k] = rep[k];
                    top_aabb[k] = std::min(top_aabb[k], rep[k]);
                    top_aabb[3 + k] = std::max(top_aabb[3 + k], rep[k]);
                }
                if (aff_total < aff_cap) {
                    std::memcpy(aff_flat + 3 * aff_total, rep.data(),
                                3 * sizeof(float));
                    aff_total++;
                } else {
                    overflow = true;
                }
                float dmax2 = 0.0f;
                for (int k = 0; k < 3; ++k)
                    dmax2 += sq(std::max(rep[k] - fr.vlo[k], fr.vhi[k] - rep[k]));
                if (!(dmax2 <= min_aff_l2)) {
                    for (uint32_t id : fr.afford) {
                        const auto& p = pts[id];
                        if (distsq_to(fr.vlo, fr.vhi, p) <= max_aff_l2) {
                            for (int k = 0; k < 3; ++k) {
                                aabb[k] = std::min(aabb[k], p[k]);
                                aabb[3 + k] = std::max(aabb[3 + k], p[k]);
                            }
                            if (aff_total < aff_cap) {
                                std::memcpy(aff_flat + 3 * aff_total, p.data(),
                                            3 * sizeof(float));
                                aff_total++;
                            } else {
                                overflow = true;
                            }
                        }
                    }
                }
            } else {
                for (int k = 0; k < 6; ++k) aabb[k] = INF;
            }
            aff_start[z + 1] = aff_total;
            continue;
        }

        const int d = fr.d;
        std::stable_sort(argsort.begin() + fr.begin,
                         argsort.begin() + fr.begin + fr.count,
                         [&pts, d](uint32_t a, uint32_t b) {
                             return pts[a][d] < pts[b][d];
                         });
        const int mid = fr.count / 2;
        const float test = (pts[argsort[fr.begin + mid - 1]][d] +
                            pts[argsort[fr.begin + mid]][d]) /
                           2.0f;
        tests[fr.i] = test;

        Frame lo_fr, hi_fr;
        lo_fr.begin = fr.begin;
        lo_fr.count = mid;
        lo_fr.i = 2 * fr.i + 1;
        lo_fr.d = (d + 1) % 3;
        lo_fr.vlo = fr.vlo;
        lo_fr.vhi = fr.vhi;
        lo_fr.vhi[d] = test;
        hi_fr.begin = fr.begin + mid;
        hi_fr.count = fr.count - mid;
        hi_fr.i = 2 * fr.i + 2;
        hi_fr.d = (d + 1) % 3;
        hi_fr.vlo = fr.vlo;
        hi_fr.vlo[d] = test;
        hi_fr.vhi = fr.vhi;

        for (uint32_t id : fr.afford) {
            const float c = pts[id][d];
            if (c <= test + r_max) lo_fr.afford.push_back(id);
            if (c >= test - r_max) hi_fr.afford.push_back(id);
        }
        // boundary candidates from the sibling's sorted range
        for (int i = fr.begin; i < fr.begin + mid; ++i) {
            const float c = pts[argsort[i]][d];
            if (std::isfinite(c) && c >= test - r_max)
                hi_fr.afford.push_back(argsort[i]);
        }
        for (int i = fr.begin + mid; i < fr.begin + fr.count; ++i) {
            const float c = pts[argsort[i]][d];
            if (std::isfinite(c) && c <= test + r_max)
                lo_fr.afford.push_back(argsort[i]);
        }

        // push hi first so lo is processed first (DFS leaf order)
        stack.push_back(std::move(hi_fr));
        stack.push_back(std::move(lo_fr));
    }

    return overflow ? -1 : aff_total;
}

// Per-voxel min SQUARED distance from voxel center to any point, windowed:
// each point only updates voxels within `win` cells (Chebyshev) of its own
// voxel.  A voxel outside every point's window has true center distance
// > win*cell (the point lies inside its voxel, so the per-axis gap is at
// least (g-1)*cell for Chebyshev grid distance g >= win+1); callers size
// `win` so win*cell exceeds the largest radius they threshold against, which
// makes the windowed result exact for every threshold they use.  Replaces a
// KDTree query over all W^3 centers (vamp_mvt_tpu/collision/pc_kernel.py),
// which was the pointcloud-suite build-time dominator.
void vamp_voxel_mindist2(const float* pts, int n, const float* wmin,
                         float cell, int W, int win, float* out) {
    const float inv = 1.0f / cell;
    const long total = (long)W * W * W;
    for (long i = 0; i < total; ++i) out[i] = INFINITY;
    for (int k = 0; k < n; ++k) {
        const float px = pts[3 * k], py = pts[3 * k + 1], pz = pts[3 * k + 2];
        int vx = (int)std::floor((px - wmin[0]) * inv);
        int vy = (int)std::floor((py - wmin[1]) * inv);
        int vz = (int)std::floor((pz - wmin[2]) * inv);
        const int x0 = std::max(vx - win, 0), x1 = std::min(vx + win, W - 1);
        const int y0 = std::max(vy - win, 0), y1 = std::min(vy + win, W - 1);
        const int z0 = std::max(vz - win, 0), z1 = std::min(vz + win, W - 1);
        for (int x = x0; x <= x1; ++x) {
            const float dx = wmin[0] + (x + 0.5f) * cell - px;
            for (int y = y0; y <= y1; ++y) {
                const float dy = wmin[1] + (y + 0.5f) * cell - py;
                const float dxy = dx * dx + dy * dy;
                float* row = out + ((long)x * W + y) * W;
                for (int z = z0; z <= z1; ++z) {
                    const float dz = wmin[2] + (z + 0.5f) * cell - pz;
                    const float d2 = dxy + dz * dz;
                    if (d2 < row[z]) row[z] = d2;
                }
            }
        }
    }
}

}  // extern "C"
