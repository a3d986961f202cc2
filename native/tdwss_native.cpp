// tdwss native host-side data ops.
//
// TPU-native rebuild of the reference's C++ data-prep components
// (SURVEY.md §2.2): KPConv grid subsampling
// (models/KPConv/cpp_wrappers/cpp_subsampling/grid_subsampling.cpp),
// KPConv radius neighbors (cpp_neighbors/neighbors.cpp + nanoflann), and the
// CGAL region-growing plane detector
// (ops/GeometricSelectiveSearch/shape_det/region_growing_on_point_set_3.cpp).
//
// Design: all spatial queries use a uniform voxel hash grid (open-addressed
// robin-hood-ish map) instead of KD-trees — simpler, cache-friendly, and the
// same machinery the device-side voxelizer uses.  Exposed as a C ABI for
// ctypes (no pybind11 in this image).
//
// Build: make -C native  (g++ -O3 -fPIC -shared)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

// Window starts / sub-offsets align to 32 source rows so the Pallas
// kernels can view (V, C<=64) sources as packed (V/p, 128)-lane rows
// (p in {2,4}) and DMA 8-aligned packed-row slices (tdwss/ops/pallas_subm).
constexpr int32_t kWinAlignM1 = 31;


struct Key {
    int32_t x, y, z;
    bool operator==(const Key& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct KeyHash {
    size_t operator()(const Key& k) const {
        // 3D integer hash (large primes, xor-fold)
        uint64_t h = static_cast<uint64_t>(k.x) * 73856093ull
                   ^ static_cast<uint64_t>(k.y) * 19349669ull
                   ^ static_cast<uint64_t>(k.z) * 83492791ull;
        return static_cast<size_t>(h);
    }
};

inline Key cell_of(const float* p, float inv_dl) {
    return Key{static_cast<int32_t>(std::floor(p[0] * inv_dl)),
               static_cast<int32_t>(std::floor(p[1] * inv_dl)),
               static_cast<int32_t>(std::floor(p[2] * inv_dl))};
}

}  // namespace

extern "C" {

// ABI contract probe: the python loader (tdwss/native.py) verifies this
// matches host_plan.WIN_ALIGN at load so a stale .so built before an
// alignment change can never feed misaligned starts to the packed Pallas
// kernels (which would silently truncate `starts // (8*p)`).
int32_t tdwss_win_align(void) { return kWinAlignM1 + 1; }

// Voxel-grid barycenter subsampling (KPConv grid_subsampling parity):
// pooled point = mean of member points, pooled features = mean, pooled
// label = majority vote.  Returns the number of output points (<= n).
// out_* buffers must hold n entries.
int32_t grid_subsample(const float* points, int64_t n,
                       const float* features, int32_t fdim,
                       const int32_t* labels,
                       float cell_size,
                       float* out_points, float* out_features,
                       int32_t* out_labels) {
    if (n <= 0 || cell_size <= 0) return 0;
    const float inv_dl = 1.0f / cell_size;
    std::unordered_map<Key, int32_t, KeyHash> cells;
    cells.reserve(static_cast<size_t>(n) * 2);

    std::vector<int32_t> counts;
    std::vector<std::unordered_map<int32_t, int32_t>> label_votes;
    int32_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        Key key = cell_of(points + 3 * i, inv_dl);
        auto it = cells.find(key);
        int32_t idx;
        if (it == cells.end()) {
            idx = m++;
            cells.emplace(key, idx);
            counts.push_back(0);
            std::memset(out_points + 3 * idx, 0, 3 * sizeof(float));
            if (features)
                std::memset(out_features + fdim * idx, 0, fdim * sizeof(float));
            if (labels) label_votes.emplace_back();
        } else {
            idx = it->second;
        }
        counts[idx] += 1;
        for (int d = 0; d < 3; ++d) out_points[3 * idx + d] += points[3 * i + d];
        if (features)
            for (int d = 0; d < fdim; ++d)
                out_features[fdim * idx + d] += features[fdim * i + d];
        if (labels) label_votes[idx][labels[i]] += 1;
    }
    for (int32_t j = 0; j < m; ++j) {
        const float inv = 1.0f / counts[j];
        for (int d = 0; d < 3; ++d) out_points[3 * j + d] *= inv;
        if (features)
            for (int d = 0; d < fdim; ++d) out_features[fdim * j + d] *= inv;
        if (labels) {
            int32_t best = -100, best_count = -1;
            for (auto& kv : label_votes[j])
                if (kv.second > best_count) { best_count = kv.second; best = kv.first; }
            out_labels[j] = best;
        }
    }
    return m;
}

// Radius neighbors via hash grid (KPConv batch_neighbors parity):
// for each query, indices of support points within `radius`, padded with -1
// to `max_neighbors` (closest kept when overflowing).
void radius_neighbors(const float* queries, int64_t nq,
                      const float* supports, int64_t ns,
                      float radius, int32_t max_neighbors,
                      int32_t* out_idx) {
    const float inv_dl = 1.0f / radius;
    const float r2 = radius * radius;
    std::unordered_map<Key, std::vector<int32_t>, KeyHash> grid;
    grid.reserve(static_cast<size_t>(ns) * 2);
    for (int64_t i = 0; i < ns; ++i)
        grid[cell_of(supports + 3 * i, inv_dl)].push_back(static_cast<int32_t>(i));

    std::vector<std::pair<float, int32_t>> found;
    for (int64_t q = 0; q < nq; ++q) {
        found.clear();
        const float* qp = queries + 3 * q;
        Key c = cell_of(qp, inv_dl);
        for (int dx = -1; dx <= 1; ++dx)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                    auto it = grid.find(Key{c.x + dx, c.y + dy, c.z + dz});
                    if (it == grid.end()) continue;
                    for (int32_t s : it->second) {
                        const float* sp = supports + 3 * s;
                        float d2 = 0;
                        for (int d = 0; d < 3; ++d) {
                            float t = qp[d] - sp[d];
                            d2 += t * t;
                        }
                        if (d2 <= r2) found.emplace_back(d2, s);
                    }
                }
        if (static_cast<int32_t>(found.size()) > max_neighbors) {
            std::partial_sort(found.begin(), found.begin() + max_neighbors,
                              found.end());
            found.resize(max_neighbors);
        }
        int32_t* row = out_idx + static_cast<int64_t>(max_neighbors) * q;
        int32_t k = 0;
        for (auto& pr : found) row[k++] = pr.second;
        for (; k < max_neighbors; ++k) row[k] = -1;
    }
}

// Region growing plane detection (CGAL shape_det parity):
// greedy BFS growth from unassigned seeds over k-NN graph; a neighbor joins
// a region if its distance to the region plane < max_dist and its normal is
// within max_angle_deg of the region normal; regions smaller than min_region
// are discarded.  Plane is refit (incremental centroid/normal averaging).
// out_region: per-point region id, -1 = unassigned.  Returns #regions.
int32_t region_grow(const float* points, const float* normals, int64_t n,
                    int32_t k, float max_dist, float max_angle_deg,
                    int32_t min_region, float cell_size,
                    int32_t* out_region) {
    if (n == 0) return 0;
    // kNN via hash grid with expanding ring search
    const float inv_dl = 1.0f / cell_size;
    std::unordered_map<Key, std::vector<int32_t>, KeyHash> grid;
    grid.reserve(static_cast<size_t>(n) * 2);
    for (int64_t i = 0; i < n; ++i)
        grid[cell_of(points + 3 * i, inv_dl)].push_back(static_cast<int32_t>(i));

    std::vector<int32_t> knn(static_cast<size_t>(n) * k, -1);
    std::vector<std::pair<float, int32_t>> cand;
    for (int64_t i = 0; i < n; ++i) {
        cand.clear();
        const float* p = points + 3 * i;
        Key c = cell_of(p, inv_dl);
        for (int ring = 1; ring <= 3 && static_cast<int32_t>(cand.size()) < k + 1; ++ring) {
            cand.clear();
            for (int dx = -ring; dx <= ring; ++dx)
                for (int dy = -ring; dy <= ring; ++dy)
                    for (int dz = -ring; dz <= ring; ++dz) {
                        auto it = grid.find(Key{c.x + dx, c.y + dy, c.z + dz});
                        if (it == grid.end()) continue;
                        for (int32_t s : it->second) {
                            if (s == i) continue;
                            const float* sp = points + 3 * s;
                            float d2 = 0;
                            for (int d = 0; d < 3; ++d) {
                                float t = p[d] - sp[d];
                                d2 += t * t;
                            }
                            cand.emplace_back(d2, s);
                        }
                    }
        }
        int32_t kk = std::min<int32_t>(k, static_cast<int32_t>(cand.size()));
        std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
        for (int32_t j = 0; j < kk; ++j) knn[i * k + j] = cand[j].second;
    }

    const float cos_thresh = std::cos(max_angle_deg * 3.14159265358979f / 180.0f);
    std::fill(out_region, out_region + n, -1);
    int32_t num_regions = 0;
    std::vector<int32_t> queue;
    std::vector<int32_t> members;
    for (int64_t seed = 0; seed < n; ++seed) {
        if (out_region[seed] != -1) continue;
        // region state: centroid + averaged normal
        double cx = 0, cy = 0, cz = 0, nx = normals[3 * seed],
               ny = normals[3 * seed + 1], nz = normals[3 * seed + 2];
        members.clear();
        queue.clear();
        queue.push_back(static_cast<int32_t>(seed));
        out_region[seed] = num_regions;
        members.push_back(static_cast<int32_t>(seed));
        cx = points[3 * seed]; cy = points[3 * seed + 1]; cz = points[3 * seed + 2];
        size_t head = 0;
        while (head < queue.size()) {
            int32_t cur = queue[head++];
            for (int32_t j = 0; j < k; ++j) {
                int32_t nb = knn[static_cast<size_t>(cur) * k + j];
                if (nb < 0 || out_region[nb] != -1) continue;
                // normal agreement
                const float* nn = normals + 3 * nb;
                double nlen = std::sqrt(nx * nx + ny * ny + nz * nz) + 1e-12;
                double dot = (nn[0] * nx + nn[1] * ny + nn[2] * nz) / nlen;
                if (std::fabs(dot) < cos_thresh) continue;
                // distance to current region plane
                double mcnt = static_cast<double>(members.size());
                double px = points[3 * nb] - cx / mcnt;
                double py = points[3 * nb + 1] - cy / mcnt;
                double pz = points[3 * nb + 2] - cz / mcnt;
                double dist = std::fabs((px * nx + py * ny + pz * nz) / nlen);
                if (dist > max_dist) continue;
                out_region[nb] = num_regions;
                queue.push_back(nb);
                members.push_back(nb);
                cx += points[3 * nb]; cy += points[3 * nb + 1]; cz += points[3 * nb + 2];
                double sign = dot >= 0 ? 1.0 : -1.0;
                nx += sign * nn[0]; ny += sign * nn[1]; nz += sign * nn[2];
            }
        }
        if (static_cast<int32_t>(members.size()) < min_region) {
            for (int32_t mIdx : members) out_region[mIdx] = -1;
        } else {
            ++num_regions;
        }
    }
    return num_regions;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Sparse-conv plan building (host twin of tdwss/ops/host_plan.py hot path)
// ---------------------------------------------------------------------------

#include <atomic>
#include <thread>

namespace {

constexpr int kCoordBits = 12;  // matches tdwss.ops.coords.COORD_BITS

inline int64_t pack_voxel_key(const int32_t* c) {
    return (static_cast<int64_t>(c[3]) << (3 * kCoordBits)) |
           (static_cast<int64_t>(c[2]) << (2 * kCoordBits)) |
           (static_cast<int64_t>(c[1]) << kCoordBits) |
           static_cast<int64_t>(c[0]);
}

inline uint64_t mix64(uint64_t x) {
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33; return x;
}

// Open-addressed key->index table with atomic CAS inserts.
struct VoxelHash {
    std::vector<std::atomic<int64_t>> keys;
    std::vector<int32_t> vals;
    uint64_t mask;

    explicit VoxelHash(size_t n) {
        size_t cap = 64;
        while (cap < 2 * n) cap <<= 1;
        keys = std::vector<std::atomic<int64_t>>(cap);
        for (auto& k : keys) k.store(-1, std::memory_order_relaxed);
        vals.assign(cap, -1);
        mask = cap - 1;
    }
    void insert(int64_t key, int32_t val) {
        uint64_t slot = mix64(static_cast<uint64_t>(key)) & mask;
        for (;;) {
            int64_t expect = -1;
            if (keys[slot].compare_exchange_strong(expect, key,
                                                   std::memory_order_acq_rel)) {
                vals[slot] = val;
                return;
            }
            if (expect == key) { vals[slot] = val; return; }
            slot = (slot + 1) & mask;
        }
    }
    int32_t find(int64_t key) const {
        uint64_t slot = mix64(static_cast<uint64_t>(key)) & mask;
        for (;;) {
            int64_t k = keys[slot].load(std::memory_order_acquire);
            if (k == key) return vals[slot];
            if (k == -1) return -1;
            slot = (slot + 1) & mask;
        }
    }
};

template <typename F>
void parallel_for(int64_t n, F f) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t nthreads = std::min<int64_t>(hw ? hw : 4, std::max<int64_t>(n / 16384, 1));
    if (nthreads <= 1) { f(0, n); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int64_t t = 0; t < nthreads; ++t) {
        int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { f(lo, hi); });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Submanifold-conv rulebook: for each of V voxels (coords (V,4) int32
// [x,y,z,b], valid prefix mask, KEY-SORTED ascending as produced by
// voxelize), the index of the voxel at coords+offset for every centred
// kernel offset (x-fastest ordering, tdwss.ops.coords.kernel_offsets
// parity), or -1.  out_rb is (V, kernel_size^3) int32.
//
// Algorithm: for a fixed offset d, query keys key(c_i + d) = key_i + dkey
// for every in-range row — a SORTED stream — so each offset column is one
// linear merge against the sorted key array instead of 27 random hash
// probes per voxel (~6x faster at 786k voxels, and it parallelizes over
// offset x chunk with a binary-search start).
void subm_rulebook(const int32_t* coords, const uint8_t* valid, int64_t v,
                   int32_t kernel_size, int32_t* out_rb) {
    const int32_t k3 = kernel_size * kernel_size * kernel_size;
    const int32_t half = kernel_size / 2;
    const int32_t cmax = 1 << kCoordBits;

    int64_t nv = 0;                       // valid prefix length
    while (nv < v && valid[nv]) ++nv;

    std::vector<int64_t> keys(static_cast<size_t>(nv));
    parallel_for(nv, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i)
            keys[i] = pack_voxel_key(coords + 4 * i);
    });

    // invalid tail rows: all -1
    parallel_for(v - nv, [&](int64_t lo, int64_t hi) {
        for (int64_t i = nv + lo; i < nv + hi; ++i)
            std::fill(out_rb + static_cast<int64_t>(k3) * i,
                      out_rb + static_cast<int64_t>(k3) * (i + 1), -1);
    });

    const int32_t centre = (k3 - 1) / 2;
    unsigned hw = std::thread::hardware_concurrency();
    int64_t chunks = std::min<int64_t>(hw ? hw : 4,
                                       std::max<int64_t>(nv / 16384, 1));
    int64_t chunk = (nv + chunks - 1) / std::max<int64_t>(chunks, 1);

    std::vector<std::thread> ts;
    for (int32_t o = 0; o < k3; ++o) {
        const int32_t ox = (o / (kernel_size * kernel_size)) - half;
        const int32_t oy = ((o / kernel_size) % kernel_size) - half;
        const int32_t oz = (o % kernel_size) - half;
        const int64_t dkey = (static_cast<int64_t>(oz) << (2 * kCoordBits)) +
                             (static_cast<int64_t>(oy) << kCoordBits) + ox;
        for (int64_t t = 0; t < chunks; ++t) {
            int64_t lo = t * chunk, hi = std::min(nv, lo + chunk);
            if (lo >= hi) continue;
            ts.emplace_back([=, &keys] {
                if (o == centre) {
                    for (int64_t i = lo; i < hi; ++i)
                        out_rb[static_cast<int64_t>(k3) * i + o] =
                            static_cast<int32_t>(i);
                    return;
                }
                // galloping start: first voxel whose key >= first query
                int64_t j = std::lower_bound(keys.begin(), keys.end(),
                                             keys[lo] + dkey) - keys.begin();
                for (int64_t i = lo; i < hi; ++i) {
                    const int32_t* c = coords + 4 * i;
                    int32_t qx = c[0] + ox, qy = c[1] + oy, qz = c[2] + oz;
                    int64_t q = keys[i] + dkey;
                    while (j < nv && keys[j] < q) ++j;
                    if (j > nv) j = nv;
                    int32_t hit = -1;
                    if (qx >= 0 && qx < cmax && qy >= 0 && qy < cmax &&
                        qz >= 0 && qz < cmax && j < nv && keys[j] == q)
                        hit = static_cast<int32_t>(j);
                    out_rb[static_cast<int64_t>(k3) * i + o] = hit;
                }
            });
            if (ts.size() >= static_cast<size_t>(chunks)) {
                for (auto& th : ts) th.join();
                ts.clear();
            }
        }
    }
    for (auto& th : ts) th.join();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Sort-based voxelization (host twin of tdwss/ops/host_plan.voxelize_np)
// ---------------------------------------------------------------------------

namespace {

struct KeyIdx {
    int64_t key;
    int32_t idx;
};

constexpr int kRadixBits = 12;
constexpr int kRadixSize = 1 << kRadixBits;

// Stable LSD radix sort by non-negative key (12-bit digits); ties keep
// insertion order, so items appended in index order stay idx-stable.
void radix_sort_key_idx(std::vector<KeyIdx>& items, int64_t max_key) {
    std::vector<KeyIdx> tmp(items.size());
    std::vector<int64_t> count(static_cast<size_t>(kRadixSize) + 1);
    int shift = 0;
    while ((max_key >> shift) > 0) {
        std::fill(count.begin(), count.end(), 0);
        for (const auto& it : items)
            ++count[((it.key >> shift) & (kRadixSize - 1)) + 1];
        for (int b = 0; b < kRadixSize; ++b) count[b + 1] += count[b];
        for (const auto& it : items)
            tmp[count[(it.key >> shift) & (kRadixSize - 1)]++] = it;
        items.swap(tmp);
        shift += kRadixBits;
    }
}

// Sort by key ascending, stable (items are appended in index order, so
// stability == ties sorted by idx).  Small inputs: comparison sort;
// large: stable LSD radix (12-bit digits) — ~3x the bucketed
// std::stable_sort it replaced at bench L0 (786k keys).
void sort_key_idx(std::vector<KeyIdx>& items) {
    const int64_t n = static_cast<int64_t>(items.size());
    if (n < (1 << 15)) {
        std::stable_sort(items.begin(), items.end(),
                         [](const KeyIdx& a, const KeyIdx& b) {
                             return a.key < b.key ||
                                    (a.key == b.key && a.idx < b.idx);
                         });
        return;
    }
    int64_t max_key = 0;
    for (const auto& it : items) max_key = std::max(max_key, it.key);
    radix_sort_key_idx(items, max_key);
}

}  // namespace

extern "C" {

// Deduplicate (x,y,z,b) int32 coords into a key-sorted voxel set.
// Outputs sized for capacity v: vox_coords (v,4), key_hi/key_lo (v,),
// out_valid (v,) u8, counts (v,) i32, point2voxel (n,) i32 (== v when the
// point is invalid or its voxel overflowed capacity), vox_feats (v,fdim)
// f32 (mean, may be null).  Returns the true number of distinct voxels
// (may exceed v = overflow).
// sorted_order (n,) optional: valid point indices in voxel-sorted order,
// invalid/overflowed points appended at the tail — the permutation that
// makes each voxel's member points a contiguous run (used by the
// scatter-free devoxelize VJP).
int32_t voxelize(const int32_t* coords, const uint8_t* valid, int64_t n,
                 int32_t v, const float* feats, int32_t fdim,
                 int32_t* vox_coords, int32_t* key_hi, int32_t* key_lo,
                 uint8_t* out_valid, int32_t* counts, int32_t* point2voxel,
                 float* vox_feats, int32_t* sorted_order) {
    std::vector<KeyIdx> items;
    items.reserve(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i)
        if (valid[i])
            items.push_back({pack_voxel_key(coords + 4 * i),
                             static_cast<int32_t>(i)});
    sort_key_idx(items);

    std::fill(point2voxel, point2voxel + n, v);
    const int32_t invalid_key = 0x7fffffff;
    for (int32_t j = 0; j < v; ++j) {
        key_hi[j] = invalid_key;
        key_lo[j] = invalid_key;
        out_valid[j] = 0;
        counts[j] = 0;
        for (int d = 0; d < 4; ++d) vox_coords[4 * j + d] = 0;
    }
    if (vox_feats && fdim > 0)
        std::fill(vox_feats, vox_feats + static_cast<int64_t>(v) * fdim, 0.0f);

    int32_t rank = -1;
    int64_t prev_key = -1;
    for (const auto& it : items) {
        if (it.key != prev_key) {
            ++rank;
            prev_key = it.key;
            if (rank < v) {
                const int32_t* c = coords + 4 * it.idx;
                for (int d = 0; d < 4; ++d) vox_coords[4 * rank + d] = c[d];
                key_hi[rank] = static_cast<int32_t>(it.key >> (2 * kCoordBits));
                key_lo[rank] = static_cast<int32_t>(
                    it.key & ((1LL << (2 * kCoordBits)) - 1));
                out_valid[rank] = 1;
            }
        }
        if (rank < v) {
            point2voxel[it.idx] = rank;
            ++counts[rank];
            if (vox_feats && fdim > 0) {
                const float* f = feats + static_cast<int64_t>(it.idx) * fdim;
                float* o = vox_feats + static_cast<int64_t>(rank) * fdim;
                for (int32_t d = 0; d < fdim; ++d) o[d] += f[d];
            }
        }
    }
    int32_t nuniq = rank + 1;
    if (sorted_order) {
        int64_t at = 0;
        for (const auto& it : items)
            if (point2voxel[it.idx] < v) sorted_order[at++] = it.idx;
        for (int64_t i = 0; i < n; ++i)
            if (point2voxel[i] >= v) sorted_order[at++] = static_cast<int32_t>(i);
    }
    if (vox_feats && fdim > 0) {
        int32_t kept = std::min(nuniq, v);
        parallel_for(kept, [&](int64_t lo, int64_t hi) {
            for (int64_t j = lo; j < hi; ++j) {
                float inv = counts[j] > 0 ? 1.0f / counts[j] : 0.0f;
                float* o = vox_feats + j * fdim;
                for (int32_t d = 0; d < fdim; ++d) o[d] *= inv;
            }
        });
    }
    return nuniq;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Windowed-27 metadata builder (host twin of
// tdwss/ops/host_plan.build_windowed_subm27's fixed-window middle section).
// One parallel pass computes per-(tile, group) window starts, optional
// two-level sub-window offsets, window-local rulebook entries, and the
// v-sorted spill list — replacing ~10 full numpy passes over the (V, 27)
// rulebook (measured 8.2 s -> well under 1 s per bench batch on one core).
// ---------------------------------------------------------------------------

namespace {

// rb (v, kmax) int32 (-1 = missing; entries index a v_src-row source
// array); v % tile == 0; nwin must divide kmax
// (tap -> window group = tap % nwin: the universal group rule — for the
// 27-tap subm form k%9 selects the (dy,dz) pair and k%3 the dz; for
// cross-level gathers k % stride separates the fine z-slabs).
// sub == 0 disables the two-level split, else sub | tile and subwin % 8 == 0.
// Outputs: out_starts (v/tile, nwin), out_suboff (v/sub, nwin) when sub,
// out_rblocal (v, kmax) in LocalT (int32, or int16 when window < 32768 —
// rb_local is the dominant host->device leaf and the kernels upcast
// in-graph), out_spills (e_cap, 3) rows [v, tap, src] v-sorted.
// Returns the TOTAL spill count (only the first e_cap rows are written);
// callers re-invoke with a larger buffer when it exceeds e_cap.
template <typename LocalT>
int64_t windowed_rb_impl(const int32_t* rb27, int64_t v, int64_t v_src,
                    int32_t kmax,
                    int32_t tile, int32_t window, int32_t nwin, int32_t sub,
                    int32_t subwin,
                    int32_t* out_starts, int32_t* out_suboff,
                    LocalT* out_rblocal, int32_t* out_spills, int64_t e_cap) {
    const int64_t tiles = v / tile;
    std::vector<int32_t> gmap(static_cast<size_t>(kmax));
    for (int32_t k = 0; k < kmax; ++k) gmap[k] = k % nwin;
    // windows index the SOURCE array (== the out domain for the subm
    // form, the other level for cross-level gathers)
    const int32_t start_hi = static_cast<int32_t>(
        v_src > window ? v_src - window : 0);
    const int32_t sentinel = sub ? subwin : window;

    std::vector<std::vector<int32_t>> tile_spills(static_cast<size_t>(tiles));

    // one pass: starts, sub offsets, locals, per-tile spill lists
    // (v-sorted by construction — no second sweep over the rulebook)
    parallel_for(tiles, [&](int64_t lo, int64_t hi) {
        for (int64_t t = lo; t < hi; ++t) {
            int32_t* st = out_starts + t * nwin;
            int32_t gmin[32];
            for (int32_t g = 0; g < nwin; ++g) gmin[g] = INT32_MAX;
            const int32_t* rb_t = rb27 + t * tile * kmax;
            for (int64_t r = 0; r < tile; ++r)
                for (int32_t k = 0; k < kmax; ++k) {
                    const int32_t e = rb_t[r * kmax + k];
                    const int32_t x = e < 0 ? INT32_MAX : e;   // branchless
                    if (x < gmin[gmap[k]]) gmin[gmap[k]] = x;
                }
            for (int32_t g = 0; g < nwin; ++g) {
                // empty group: numpy clamps (INT32_MAX & ~kWinAlignM1) to the top
                int32_t s = (gmin[g] == INT32_MAX) ? start_hi
                                                   : (gmin[g] & ~kWinAlignM1);
                st[g] = std::min(std::max(s, 0), start_hi);
            }

            auto& spills = tile_spills[t];
            const int64_t spt = sub ? tile / sub : 1;   // subs per tile
            for (int64_t si = 0; si < spt; ++si) {
                int32_t base[32];
                if (sub) {
                    int32_t smin[32];
                    for (int32_t g = 0; g < nwin; ++g) smin[g] = INT32_MAX;
                    const int32_t* rb_s = rb_t + si * sub * kmax;
                    for (int64_t r = 0; r < sub; ++r)
                        for (int32_t k = 0; k < kmax; ++k) {
                            const int32_t e = rb_s[r * kmax + k];
                            const int32_t x = e < 0 ? INT32_MAX : e;
                            if (x < smin[gmap[k]]) smin[gmap[k]] = x;
                        }
                    int32_t* so = out_suboff + (t * spt + si) * nwin;
                    for (int32_t g = 0; g < nwin; ++g) {
                        // empty group: numpy's (INT32_MAX - big) & ~kWinAlignM1
                        // clips to the top of the window
                        int32_t off = (smin[g] == INT32_MAX)
                            ? (window - subwin)
                            : ((smin[g] - st[g]) & ~kWinAlignM1);
                        off = std::min(std::max(off, 0), window - subwin);
                        so[g] = off;
                        base[g] = st[g] + off;
                    }
                } else {
                    for (int32_t g = 0; g < nwin; ++g) base[g] = st[g];
                }
                int32_t base_k[32];
                for (int32_t k = 0; k < kmax; ++k) base_k[k] = base[gmap[k]];
                const int64_t rows = sub ? sub : tile;
                const int64_t row0 = t * tile + si * (sub ? sub : 0);
                for (int64_t r = 0; r < rows; ++r) {
                    const int32_t* rb_r = rb27 + (row0 + r) * kmax;
                    LocalT* out_r = out_rblocal + (row0 + r) * kmax;
                    for (int32_t k = 0; k < kmax; ++k) {
                        const int32_t e = rb_r[k];
                        const int32_t local = e - base_k[k];
                        const bool ok = (e >= 0) & (local >= 0) &
                                        (local < sentinel);
                        out_r[k] = ok ? static_cast<LocalT>(local)
                                      : static_cast<LocalT>(sentinel);
                        if (e >= 0 && !ok) {
                            spills.push_back(static_cast<int32_t>(row0 + r));
                            spills.push_back(k);
                            spills.push_back(e);
                        }
                    }
                }
            }
        }
    });

    int64_t total = 0;
    for (int64_t t = 0; t < tiles; ++t)
        total += static_cast<int64_t>(tile_spills[t].size()) / 3;
    int64_t at = 0;
    for (int64_t t = 0; t < tiles && at < e_cap; ++t) {
        const auto& sp = tile_spills[t];
        const int64_t n = std::min<int64_t>(
            static_cast<int64_t>(sp.size()) / 3, e_cap - at);
        std::memcpy(out_spills + at * 3, sp.data(),
                    static_cast<size_t>(n) * 3 * sizeof(int32_t));
        at += n;
    }
    return total;
}

}  // namespace

extern "C" {

int64_t windowed_rb(const int32_t* rb27, int64_t v, int64_t v_src,
                    int32_t kmax, int32_t tile, int32_t window, int32_t nwin,
                    int32_t sub, int32_t subwin, int32_t* out_starts,
                    int32_t* out_suboff, int32_t* out_rblocal,
                    int32_t* out_spills, int64_t e_cap) {
    return windowed_rb_impl<int32_t>(rb27, v, v_src, kmax, tile, window,
                                     nwin, sub, subwin, out_starts,
                                     out_suboff, out_rblocal, out_spills,
                                     e_cap);
}

int64_t windowed_rb16(const int32_t* rb27, int64_t v, int64_t v_src,
                      int32_t kmax, int32_t tile, int32_t window,
                      int32_t nwin, int32_t sub, int32_t subwin,
                      int32_t* out_starts, int32_t* out_suboff,
                      int16_t* out_rblocal, int32_t* out_spills,
                      int64_t e_cap) {
    return windowed_rb_impl<int16_t>(rb27, v, v_src, kmax, tile, window,
                                     nwin, sub, subwin, out_starts,
                                     out_suboff, out_rblocal, out_spills,
                                     e_cap);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused submanifold windowed plan (27-tap form)
// ---------------------------------------------------------------------------

extern "C" {

// One pass from key-sorted coords to the Windowed27 metadata, never
// materializing the (V, 27) global rulebook: the 85 MB rb27 at bench L0
// plus windowed_rb's two further passes over it made plan building
// memory-bandwidth-bound on host (~1.7 s/batch of the 2.5 s total).  A
// tile's 27 neighbor columns live in a 55 KB stack buffer (cache
// resident); DRAM traffic drops to the key reads + the int16 rb_local
// write.
//
// coords (v, 4) int32 [x,y,z,b], key-sorted with a valid prefix (invalid
// tail rows produce all-sentinel locals, like subm_rulebook's -1 rows).
// Semantics match subm_rulebook + windowed_rb composed (starts clamping,
// sub offsets, sentinel = subwin when sub else window, v-sorted spills
// [row, tap, src]).  Returns the TOTAL spill count; only the first e_cap
// spill rows are written — callers re-invoke with a larger buffer.
int64_t subm_windowed_plan(const int32_t* coords, const uint8_t* valid,
                           int64_t v, int32_t tile, int32_t window,
                           int32_t nwin, int32_t sub, int32_t subwin,
                           int32_t* out_starts, int32_t* out_suboff,
                           int16_t* out_rblocal, int32_t* out_spills,
                           int64_t e_cap) {
    const bool prof = std::getenv("TDWSS_NATIVE_PROF") != nullptr;
    const auto tic = std::chrono::steady_clock::now();
    constexpr int32_t kK = 27;
    const int32_t cmax = 1 << kCoordBits;
    const int64_t tiles = v / tile;

    int64_t nv = 0;
    while (nv < v && valid[nv]) ++nv;

    // +1 sentinel row (INT64_MAX) so the merge loop below needs no
    // j < nv bound check: queries are valid keys + small tap shifts,
    // strictly below the sentinel.
    std::vector<int64_t> keys(static_cast<size_t>(nv) + 1);
    keys[nv] = std::numeric_limits<int64_t>::max();
    parallel_for(nv, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i)
            keys[i] = pack_voxel_key(coords + 4 * i);
    });

    // per-tap key shift + group map (tap = ox*9 + oy*3 + oz, x slowest in
    // the tap index; group = tap % nwin — see tdwss.ops.plan.Windowed27).
    // tapmask[o]: which domain-border bits (see edge bytes below) make
    // this tap's query wrap a coordinate field.
    int64_t dkey[kK];
    int32_t gmap[kK];
    uint8_t tapmask[kK];
    for (int32_t o = 0; o < kK; ++o) {
        const int32_t ox = o / 9 - 1, oy = (o / 3) % 3 - 1, oz = o % 3 - 1;
        dkey[o] = (static_cast<int64_t>(oz) << (2 * kCoordBits)) +
                  (static_cast<int64_t>(oy) << kCoordBits) + ox;
        gmap[o] = o % nwin;
        uint8_t m = 0;
        if (ox < 0) m |= 1;
        if (ox > 0) m |= 2;
        if (oy < 0) m |= 4;
        if (oy > 0) m |= 8;
        if (oz < 0) m |= 16;
        if (oz > 0) m |= 32;
        tapmask[o] = m;
    }
    const int32_t start_hi = static_cast<int32_t>(v > window ? v - window : 0);
    const int32_t sentinel = sub ? subwin : window;
    const int64_t spt = sub ? tile / sub : 1;

    std::vector<std::vector<int32_t>> tile_spills(static_cast<size_t>(tiles));
    std::atomic<int64_t> ns_walk{0}, ns_emit{0};   // prof-only accumulators

    parallel_for(tiles, [&](int64_t lo, int64_t hi) {
        std::vector<int32_t> rbcol(static_cast<size_t>(kK) * tile);
        std::vector<int16_t> loc16(static_cast<size_t>(kK) * tile);
        std::vector<uint8_t> edge(static_cast<size_t>(tile));
        for (int64_t t = lo; t < hi; ++t) {
            std::chrono::steady_clock::time_point t_a, t_b;
            if (prof) t_a = std::chrono::steady_clock::now();
            const int64_t row0 = t * tile;
            const int64_t rows_v = std::max<int64_t>(
                0, std::min<int64_t>(tile, nv - row0));   // valid rows here
            // edge bytes: one bit per domain border this row sits on —
            // checked against tapmask instead of six per-(row, tap)
            // coordinate comparisons (queries that wrap a coordinate
            // field can alias a real key, so they must be rejected).
            for (int64_t r = 0; r < rows_v; ++r) {
                const int32_t* c = coords + 4 * (row0 + r);
                uint8_t e = 0;
                if (c[0] == 0) e |= 1;
                if (c[0] == cmax - 1) e |= 2;
                if (c[1] == 0) e |= 4;
                if (c[1] == cmax - 1) e |= 8;
                if (c[2] == 0) e |= 16;
                if (c[2] == cmax - 1) e |= 32;
                edge[r] = e;
            }
            // 1. resolve the 27 neighbor columns: ONE merge per (dy,dz)
            // pair fills all three x columns — their query keys differ
            // by exactly +-1, so q's lower bound j also locates q-1 (at
            // j-1, the largest key below q) and q+1 (at j, or j+1 when
            // keys[j] == q) for free.  9 rank walks instead of 26.
            for (int32_t d = 0; d < 9; ++d) {
                int32_t* colm = rbcol.data() + static_cast<int64_t>(d) * tile;
                int32_t* col0 = rbcol.data() + static_cast<int64_t>(9 + d) * tile;
                int32_t* colp = rbcol.data() + static_cast<int64_t>(18 + d) * tile;
                if (rows_v == 0) {
                    std::fill(colm, colm + tile, -1);
                    std::fill(col0, col0 + tile, -1);
                    std::fill(colp, colp + tile, -1);
                    continue;
                }
                const int64_t dk = dkey[9 + d];          // ox == 0 shift
                const uint8_t tmm = tapmask[d];
                const uint8_t tm0 = tapmask[9 + d];
                const uint8_t tmp = tapmask[18 + d];
                int64_t j = (d == 4) ? row0
                    : std::lower_bound(keys.begin(), keys.begin() + nv,
                                       keys[row0] + dk) - keys.begin();
                for (int64_t r = 0; r < rows_v; ++r) {
                    const int64_t q = keys[row0 + r] + dk;
                    while (keys[j] < q) ++j;        // sentinel-guarded
                    const uint8_t e = edge[r];
                    colm[r] = (j > 0 && keys[j - 1] == q - 1 && !(e & tmm))
                                  ? static_cast<int32_t>(j - 1) : -1;
                    const bool hit0 = keys[j] == q;
                    col0[r] = (hit0 && !(e & tm0))
                                  ? static_cast<int32_t>(j) : -1;
                    const int64_t jp = j + (hit0 ? 1 : 0);
                    colp[r] = (jp < nv && keys[jp] == q + 1 && !(e & tmp))
                                  ? static_cast<int32_t>(jp) : -1;
                }
                for (int64_t r = rows_v; r < tile; ++r) {
                    colm[r] = -1; col0[r] = -1; colp[r] = -1;
                }
            }
            if (prof) {
                t_b = std::chrono::steady_clock::now();
                ns_walk += std::chrono::duration_cast<std::chrono::nanoseconds>(
                    t_b - t_a).count();
            }
            // 2. per-group window starts.  Within a column the hits are
            // strictly increasing (the merge cursor j is monotone in r),
            // so a column's min is its FIRST hit — an O(1) probe instead
            // of a tile-length min scan.
            int32_t gmin[32];
            for (int32_t g = 0; g < nwin; ++g) gmin[g] = INT32_MAX;
            for (int32_t o = 0; o < kK; ++o) {
                const int32_t* col = rbcol.data() + static_cast<int64_t>(o) * tile;
                int64_t r = 0;
                while (r < rows_v && col[r] < 0) ++r;
                const int32_t m = (r < rows_v) ? col[r] : INT32_MAX;
                if (m < gmin[gmap[o]]) gmin[gmap[o]] = m;
            }
            int32_t* st = out_starts + t * nwin;
            for (int32_t g = 0; g < nwin; ++g) {
                int32_t s = (gmin[g] == INT32_MAX) ? start_hi : (gmin[g] & ~kWinAlignM1);
                st[g] = std::min(std::max(s, 0), start_hi);
            }
            // 3. sub offsets + 4. int16 locals + spill collection
            auto& spills = tile_spills[t];
            for (int64_t si = 0; si < spt; ++si) {
                int32_t base[32];
                if (sub) {
                    int32_t smin[32];
                    for (int32_t g = 0; g < nwin; ++g) smin[g] = INT32_MAX;
                    for (int32_t o = 0; o < kK; ++o) {
                        const int32_t* col = rbcol.data() +
                            static_cast<int64_t>(o) * tile + si * sub;
                        int64_t r = 0;           // first hit == sub-range min
                        while (r < sub && col[r] < 0) ++r;
                        const int32_t m = (r < sub) ? col[r] : INT32_MAX;
                        if (m < smin[gmap[o]]) smin[gmap[o]] = m;
                    }
                    int32_t* so = out_suboff + (t * spt + si) * nwin;
                    for (int32_t g = 0; g < nwin; ++g) {
                        int32_t off = (smin[g] == INT32_MAX)
                            ? (window - subwin)
                            : ((smin[g] - st[g]) & ~kWinAlignM1);
                        off = std::min(std::max(off, 0), window - subwin);
                        so[g] = off;
                        base[g] = st[g] + off;
                    }
                } else {
                    for (int32_t g = 0; g < nwin; ++g) base[g] = st[g];
                }
                int32_t base_o[kK];
                for (int32_t o = 0; o < kK; ++o) base_o[o] = base[gmap[o]];
                const int64_t rows = sub ? sub : tile;
                const int64_t r0 = row0 + si * (sub ? sub : 0);
                const int64_t c0 = r0 - row0;        // si block start in tile
                // emit, column-major: per tap the rbcol column is read and
                // the int16 locals written CONTIGUOUSLY (a branch-free
                // loop the compiler vectorizes), into a tap-major scratch;
                // one cache-resident transpose then lays out the (row, 27)
                // device order.  ~2.5x the old row-major scalar emit.
                for (int32_t o = 0; o < kK; ++o) {
                    const int32_t* col =
                        rbcol.data() + static_cast<int64_t>(o) * tile + c0;
                    int16_t* loc = loc16.data() +
                        static_cast<int64_t>(o) * tile + c0;
                    const int32_t base_v = base_o[o];
                    int32_t any = 0;
                    for (int64_t r = 0; r < rows; ++r) {
                        const int32_t e = col[r];
                        const int32_t local = e - base_v;
                        const bool ok = (e >= 0) & (local >= 0) &
                                        (local < sentinel);
                        loc[r] = ok ? static_cast<int16_t>(local)
                                    : static_cast<int16_t>(sentinel);
                        any |= static_cast<int32_t>((e >= 0) & !ok);
                    }
                    if (any) {           // rare: rescan this block for spills
                        for (int64_t r = 0; r < rows; ++r) {
                            const int32_t e = col[r];
                            const int32_t local = e - base_v;
                            if (e >= 0 && !((local >= 0) & (local < sentinel))) {
                                spills.push_back(static_cast<int32_t>(r0 + r));
                                spills.push_back(o);
                                spills.push_back(e);
                            }
                        }
                    }
                }
            }
            // transpose the tap-major scratch into the (row, 27) output
            for (int64_t r = 0; r < tile; ++r) {
                int16_t* out_r = out_rblocal + (row0 + r) * kK;
                const int16_t* src = loc16.data() + r;
                for (int32_t o = 0; o < kK; ++o)
                    out_r[o] = src[static_cast<int64_t>(o) * tile];
            }
            // restore the contract: spills sorted by (row, tap) within
            // the tile (collection above is tap-major); spills are rare
            // so the per-tile sort is noise
            if (!spills.empty()) {
                const int64_t ntr = static_cast<int64_t>(spills.size()) / 3;
                std::vector<std::array<int32_t, 3>> tr(ntr);
                std::memcpy(tr.data(), spills.data(),
                            spills.size() * sizeof(int32_t));
                std::sort(tr.begin(), tr.end());
                std::memcpy(spills.data(), tr.data(),
                            spills.size() * sizeof(int32_t));
            }
            if (prof)
                ns_emit += std::chrono::duration_cast<std::chrono::nanoseconds>(
                    std::chrono::steady_clock::now() - t_b).count();
        }
    });

    if (prof) {
        const double ms = std::chrono::duration<double, std::milli>(
            std::chrono::steady_clock::now() - tic).count();
        fprintf(stderr,
                "[subm_windowed_plan] v=%lld main %.0f ms (walk %.0f, "
                "emit %.0f)\n", (long long)v, ms, ns_walk.load() / 1e6,
                ns_emit.load() / 1e6);
    }
    int64_t total = 0;
    for (int64_t t = 0; t < tiles; ++t)
        total += static_cast<int64_t>(tile_spills[t].size()) / 3;
    int64_t at = 0;
    for (int64_t t = 0; t < tiles && at < e_cap; ++t) {
        const auto& sp = tile_spills[t];
        const int64_t n = std::min<int64_t>(
            static_cast<int64_t>(sp.size()) / 3, e_cap - at);
        std::memcpy(out_spills + at * 3, sp.data(),
                    static_cast<size_t>(n) * 3 * sizeof(int32_t));
        at += n;
    }
    return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused strided-downsample plan (host twin of tdwss/ops/host_plan.py
// downsample_level_np + parent_rulebook composed).  Coarse keys of a
// key-sorted fine grid are NOT sorted (halving z interleaves the y
// order), so a reorder is unavoidable — but one stable radix sort plus a
// single run walk replaces the general voxelize (bucket + comparison
// sort) AND emits parent / child_offset / down_rb / rb_up in the same
// pass, where the numpy twin pays three further full-size scatter passes.
// ---------------------------------------------------------------------------

extern "C" {

// coords (vf, 4) int32 [x,y,z,b] fine grid (invalid rows zeroed, as the
// voxelizer leaves them), valid (vf,) u8, vc = coarse capacity, f == s
// (filter == stride, the only form the reference uses).  Outputs:
//   vox_coords (vc,4), key_hi/key_lo (vc,), out_valid (vc,) u8,
//   counts (vc,)                       — the coarse SparseGrid arrays
//   parent (vf,) int32                 — coarse rank, or vc when the fine
//                                        row is invalid / overflowed
//   child_offset (vf,) int32           — (x%s)*s*s + (y%s)*s + z%s
//   down_rb (vc, f^3) int32            — child fine row per tap, -1 holes
//   rb_up (vf, f^3) int32              — parent at column child_offset
// Returns the TRUE number of distinct coarse voxels (> vc = overflow).
int32_t downsample_plan(const int32_t* coords, const uint8_t* valid,
                        int64_t vf, int32_t vc, int32_t f, int32_t s,
                        int32_t* vox_coords, int32_t* key_hi, int32_t* key_lo,
                        uint8_t* out_valid, int32_t* counts,
                        int32_t* parent, int32_t* child_offset,
                        int32_t* down_rb, int32_t* rb_up) {
    const int32_t k = f * f * f;
    std::fill(down_rb, down_rb + static_cast<int64_t>(vc) * k, -1);
    std::fill(rb_up, rb_up + vf * k, -1);
    const int32_t invalid_key = 0x7fffffff;
    for (int32_t j = 0; j < vc; ++j) {
        key_hi[j] = invalid_key;
        key_lo[j] = invalid_key;
        out_valid[j] = 0;
        counts[j] = 0;
        for (int d = 0; d < 4; ++d) vox_coords[4 * j + d] = 0;
    }

    std::vector<KeyIdx> items;
    items.reserve(static_cast<size_t>(vf));
    int64_t max_key = 0;
    for (int64_t i = 0; i < vf; ++i) {
        const int32_t* c = coords + 4 * i;
        child_offset[i] = (c[0] % s) * s * s + (c[1] % s) * s + (c[2] % s);
        parent[i] = vc;
        if (valid[i]) {
            const int32_t cc[4] = {c[0] / s, c[1] / s, c[2] / s, c[3]};
            const int64_t key = pack_voxel_key(cc);
            items.push_back({key, static_cast<int32_t>(i)});
            max_key = std::max(max_key, key);
        }
    }
    radix_sort_key_idx(items, max_key);

    int32_t rank = -1;
    int64_t prev = -1;
    for (const auto& it : items) {
        if (it.key != prev) {
            ++rank;
            prev = it.key;
            if (rank < vc) {
                const int32_t* c = coords + 4 * it.idx;
                int32_t* o = vox_coords + 4 * rank;
                o[0] = c[0] / s; o[1] = c[1] / s; o[2] = c[2] / s; o[3] = c[3];
                key_hi[rank] = static_cast<int32_t>(it.key >> (2 * kCoordBits));
                key_lo[rank] = static_cast<int32_t>(
                    it.key & ((1LL << (2 * kCoordBits)) - 1));
                out_valid[rank] = 1;
            }
        }
        if (rank < vc) {
            parent[it.idx] = rank;
            ++counts[rank];
            const int32_t off = child_offset[it.idx];
            down_rb[static_cast<int64_t>(rank) * k + off] = it.idx;
            rb_up[static_cast<int64_t>(it.idx) * k + off] = rank;
        }
    }
    return rank + 1;
}

}  // extern "C"
