// Native host runtime for the TPU MVS engine.
//
// The device (JAX/Pallas) owns all dense math; this library owns the
// irregular host-side bookkeeping that Python loops handle too slowly at
// scale — the per-camera cell grids and the wavefront-expansion candidate
// generation (reference: TMVS/mvs/cellmap.{h,cpp} and the host half of
// MVS::expansionPatches / skipNeighborCell / runtimeFiltering's density
// clause, TMVS/mvs/mvs.cpp:529-601, 792-807, 877-895), plus the
// grid-hashed Euclidean neighbour counting of neighborPatchFiltering
// (mvs.cpp:448-525; the reference is an O(N^2) OMP loop — the spatial
// hash gives the same counts in ~O(N)).
//
// Plain C ABI (ctypes-loaded); geometry in double to match the host arena.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Grid {
    int num_cams;
    int cell_size;
    std::vector<int> gw, gh;                       // per-camera grid dims
    std::unordered_map<int64_t, std::vector<int>> cells;

    int64_t key(int cam, int cx, int cy) const {
        return (static_cast<int64_t>(cam) << 42) |
               (static_cast<int64_t>(cx) << 21) | static_cast<int64_t>(cy);
    }
    bool in_map(int cam, int cx, int cy) const {
        return cx >= 0 && cx < gw[cam] && cy >= 0 && cy < gh[cam];
    }
};

inline void cell_of(const Grid* g, double px, double py, int* cx, int* cy) {
    *cx = static_cast<int>(px / g->cell_size);
    *cy = static_cast<int>(py / g->cell_size);
}

inline void normal_of(const double* sph, double* n) {
    const double st = std::sin(sph[0]);
    n[0] = st * std::cos(sph[1]);
    n[1] = st * std::sin(sph[1]);
    n[2] = std::cos(sph[0]);
}

}  // namespace

extern "C" {

void* tg_create(int num_cams, const int* widths, const int* heights,
                int cell_size) {
    Grid* g = new Grid;
    g->num_cams = num_cams;
    g->cell_size = cell_size;
    g->gw.resize(num_cams);
    g->gh.resize(num_cams);
    for (int c = 0; c < num_cams; ++c) {
        g->gw[c] = (widths[c] + cell_size - 1) / cell_size;
        g->gh[c] = (heights[c] + cell_size - 1) / cell_size;
    }
    return g;
}

void tg_destroy(void* h) { delete static_cast<Grid*>(h); }

int tg_grid_dims(void* h, int cam, int* w, int* out_h) {
    Grid* g = static_cast<Grid*>(h);
    if (cam < 0 || cam >= g->num_cams) return -1;
    *w = g->gw[cam];
    *out_h = g->gh[cam];
    return 0;
}

// Insert/remove one patch into every visible camera's grid
// (CellMap::insert/drop, TMVS/mvs/cellmap.cpp:18-38).
void tg_insert_patch(void* h, int pid, const uint8_t* cam_mask,
                     const double* img_pts /* [C, 2] */) {
    Grid* g = static_cast<Grid*>(h);
    for (int c = 0; c < g->num_cams; ++c) {
        if (!cam_mask[c]) continue;
        int cx, cy;
        cell_of(g, img_pts[2 * c], img_pts[2 * c + 1], &cx, &cy);
        if (g->in_map(c, cx, cy)) g->cells[g->key(c, cx, cy)].push_back(pid);
    }
}

void tg_remove_patch(void* h, int pid, const uint8_t* cam_mask,
                     const double* img_pts) {
    Grid* g = static_cast<Grid*>(h);
    for (int c = 0; c < g->num_cams; ++c) {
        if (!cam_mask[c]) continue;
        int cx, cy;
        cell_of(g, img_pts[2 * c], img_pts[2 * c + 1], &cx, &cy);
        auto it = g->cells.find(g->key(c, cx, cy));
        if (it == g->cells.end()) continue;
        auto& v = it->second;
        for (size_t i = 0; i < v.size(); ++i) {
            if (v[i] == pid) { v.erase(v.begin() + i); break; }
        }
    }
}

// Enumerate non-empty cells. Returns the count; fills up to max_out
// (cam, cx, cy) triples when the buffers are non-null.
int tg_all_cells(void* h, int* out_cam, int* out_cx, int* out_cy,
                 int max_out) {
    Grid* g = static_cast<Grid*>(h);
    int n = 0;
    for (const auto& kv : g->cells) {
        if (kv.second.empty()) continue;
        if (out_cam != nullptr && n < max_out) {
            out_cam[n] = static_cast<int>(kv.first >> 42);
            out_cx[n] = static_cast<int>((kv.first >> 21) & 0x1FFFFF);
            out_cy[n] = static_cast<int>(kv.first & 0x1FFFFF);
        }
        ++n;
    }
    return n;
}

int tg_cell_count(void* h, int cam, int cx, int cy) {
    Grid* g = static_cast<Grid*>(h);
    auto it = g->cells.find(g->key(cam, cx, cy));
    return it == g->cells.end() ? 0 : static_cast<int>(it->second.size());
}

int tg_cell_ids(void* h, int cam, int cx, int cy, int* out, int max_out) {
    Grid* g = static_cast<Grid*>(h);
    auto it = g->cells.find(g->key(cam, cx, cy));
    if (it == g->cells.end()) return 0;
    int n = static_cast<int>(it->second.size());
    if (n > max_out) n = max_out;
    std::memcpy(out, it->second.data(), n * sizeof(int));
    return n;
}

// The insert-time density clause of MVS::runtimeFiltering
// (mvs.cpp:877-895): pass iff NOT every visible view's target cell is full.
int tg_insert_time_filter(void* h, const uint8_t* cam_mask,
                          const double* img_pts, int max_cell_patch_num) {
    Grid* g = static_cast<Grid*>(h);
    int cams = 0, full = 0;
    for (int c = 0; c < g->num_cams; ++c) {
        if (!cam_mask[c]) continue;
        ++cams;
        int cx, cy;
        cell_of(g, img_pts[2 * c], img_pts[2 * c + 1], &cx, &cy);
        if (tg_cell_count(h, c, cx, cy) >= max_cell_patch_num) ++full;
    }
    return full < cams ? 1 : 0;
}

// Wavefront candidate generation: for every parent x visible camera x
// 4-neighbour cell, apply skipNeighborCell (mvs.cpp:792-807: density cap,
// confident occupant, geometric neighbour) and the per-round seen-cells
// budget. Emits (parent, cam, cx, cy) quads. Returns the count (<= max_out;
// negative if max_out was too small).
int tg_candidates(void* h,
                  const int64_t* parents, int n_parents,
                  const double* centers,       // [N, 3] arena
                  const double* normal_sph,    // [N, 2]
                  const double* correlation,   // [N]
                  const uint8_t* alive,        // [N]
                  const uint8_t* cam_mask,     // [N, C]
                  const double* img_pts,       // [N, C, 2]
                  double min_correlation, double neighbor_radius,
                  int max_cell_patch_num,
                  int64_t* out_parent, int* out_cam, int* out_cx,
                  int* out_cy, int max_out) {
    Grid* g = static_cast<Grid*>(h);
    const int C = g->num_cams;
    int n_out = 0;
    std::unordered_map<int64_t, int> seen;   // per-round cell budget
    static const int offs[4][2] = {{-1, 0}, {0, -1}, {1, 0}, {0, 1}};

    for (int pi = 0; pi < n_parents; ++pi) {
        const int64_t pid = parents[pi];
        double n1[3];
        normal_of(normal_sph + 2 * pid, n1);
        const double* c1 = centers + 3 * pid;

        for (int cam = 0; cam < C; ++cam) {
            if (!cam_mask[pid * C + cam]) continue;
            int cx, cy;
            cell_of(g, img_pts[(pid * C + cam) * 2],
                    img_pts[(pid * C + cam) * 2 + 1], &cx, &cy);
            for (int o = 0; o < 4; ++o) {
                const int nx = cx + offs[o][0];
                const int ny = cy + offs[o][1];
                if (!g->in_map(cam, nx, ny)) continue;
                const int64_t k = g->key(cam, nx, ny);

                // skipNeighborCell over the live occupants
                auto it = g->cells.find(k);
                int occ_n = 0;
                bool skip = false;
                if (it != g->cells.end()) {
                    occ_n = static_cast<int>(it->second.size());
                    if (occ_n >= max_cell_patch_num) skip = true;
                    if (!skip) {
                        for (int q : it->second) {
                            if (!alive[q]) continue;
                            if (correlation[q] > min_correlation) {
                                skip = true;
                                break;
                            }
                            double n2[3];
                            normal_of(normal_sph + 2 * q, n2);
                            const double* c2 = centers + 3 * q;
                            const double d[3] = {c2[0] - c1[0], c2[1] - c1[1],
                                                 c2[2] - c1[2]};
                            const double dist =
                                std::fabs(d[0]*n1[0] + d[1]*n1[1] + d[2]*n1[2])
                              + std::fabs(d[0]*n2[0] + d[1]*n2[1] + d[2]*n2[2]);
                            if (dist <= neighbor_radius) { skip = true; break; }
                        }
                    }
                }
                if (skip) continue;
                auto se = seen.find(k);
                int cnt = (se == seen.end()) ? occ_n : se->second;
                if (cnt >= max_cell_patch_num) continue;
                seen[k] = cnt + 1;
                if (n_out >= max_out) return -1;
                out_parent[n_out] = pid;
                out_cam[n_out] = cam;
                out_cx[n_out] = nx;
                out_cy[n_out] = ny;
                ++n_out;
            }
        }
    }
    return n_out;
}

// Grid-hashed Euclidean neighbour counts (neighborPatchFiltering's inner
// O(N^2) loop, mvs.cpp:465-508): count patches within ``radius`` of each
// patch (excluding self). Same counts as brute force.
void tg_neighbor_counts(const double* centers, const int64_t* ids, int n,
                        double radius, int64_t* out_counts) {
    if (n == 0) return;
    const double cell = radius > 0 ? radius : 1.0;
    std::unordered_map<uint64_t, std::vector<int>> hash;
    hash.reserve(n * 2);
    auto kf = [](int64_t ix, int64_t iy, int64_t iz) -> uint64_t {
        // unsigned arithmetic: signed overflow would be UB
        return (static_cast<uint64_t>(ix) * 73856093ull) ^
               (static_cast<uint64_t>(iy) * 19349663ull) ^
               (static_cast<uint64_t>(iz) * 83492791ull);
    };
    std::vector<int64_t> cx(n), cy(n), cz(n);
    for (int i = 0; i < n; ++i) {
        const double* p = centers + 3 * ids[i];
        cx[i] = static_cast<int64_t>(std::floor(p[0] / cell));
        cy[i] = static_cast<int64_t>(std::floor(p[1] / cell));
        cz[i] = static_cast<int64_t>(std::floor(p[2] / cell));
        hash[kf(cx[i], cy[i], cz[i])].push_back(i);
    }
    const double r2 = radius * radius;
    for (int i = 0; i < n; ++i) {
        const double* p = centers + 3 * ids[i];
        int64_t count = 0;
        for (int dx = -1; dx <= 1; ++dx)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                    const int64_t ix = cx[i] + dx, iy = cy[i] + dy,
                                  iz = cz[i] + dz;
                    auto it = hash.find(kf(ix, iy, iz));
                    if (it == hash.end()) continue;
                    for (int j : it->second) {
                        if (j == i) continue;
                        // hash collisions are possible: re-check the cell
                        if (cx[j] != ix || cy[j] != iy || cz[j] != iz)
                            continue;
                        const double* q = centers + 3 * ids[j];
                        const double d0 = p[0] - q[0], d1 = p[1] - q[1],
                                     d2 = p[2] - q[2];
                        if (d0*d0 + d1*d1 + d2*d2 <= r2) ++count;
                    }
                }
        out_counts[i] = count;
    }
}

}  // extern "C"
