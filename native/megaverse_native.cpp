// Native host-side episode-generation kernels.
//
// The reference engine's scene building is C++ (VoxelGridComponent's greedy
// box merge, component_voxel_grid.hpp:108-187; voxel fills; occupancy maps).
// Our device step is JAX, but episode generation runs on the host between
// steps and must keep up with ~1k resets/s at full throughput — these are the
// hot loops, exposed through a plain C ABI consumed via ctypes
// (megaverse_tpu/utils/native.py).
//
// Build: native/build.sh (g++ -O3 -shared).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>
#include <memory>

extern "C" {

// Greedy merge of identical (visible, color) voxels into boxes.
// vtype/vcolor: [nx, ny, nz] row-major (z minor). Returns box count, or -1 on
// overflow. Boxes are written as voxel-index lo (inclusive) / hi (exclusive)
// triples, converted to world coords by the caller.
int mvn_greedy_merge(const uint8_t* vtype, const uint8_t* vcolor,
                     int nx, int ny, int nz,
                     int32_t* out_lo, int32_t* out_hi, uint8_t* out_color,
                     int max_boxes) {
    const int n = nx * ny * nz;
    std::vector<uint8_t> todo(n);
    const int sy = nz, sx = ny * nz;
    for (int i = 0; i < n; ++i) {
        const uint8_t t = vtype[i];
        // VOXEL_OPAQUE=2; solid-with-color also renders (scenario layouts)
        todo[i] = ((t & 2) != 0) || (((t & 1) != 0) && vcolor[i] > 0);
    }

    int count = 0;
    for (int x = 0; x < nx; ++x) {
        for (int y = 0; y < ny; ++y) {
            for (int z = 0; z < nz; ++z) {
                const int idx = x * sx + y * sy + z;
                if (!todo[idx]) continue;
                const uint8_t col = vcolor[idx];

                // expand along z
                int z2 = z;
                while (z2 + 1 < nz) {
                    const int j = idx + (z2 + 1 - z);
                    if (!todo[j] || vcolor[j] != col) break;
                    ++z2;
                }
                // expand along x
                int x2 = x;
                for (;;) {
                    if (x2 + 1 >= nx) break;
                    bool ok = true;
                    const int base = (x2 + 1) * sx + y * sy;
                    for (int zz = z; zz <= z2; ++zz) {
                        const int j = base + zz;
                        if (!todo[j] || vcolor[j] != col) { ok = false; break; }
                    }
                    if (!ok) break;
                    ++x2;
                }
                // expand along y
                int y2 = y;
                for (;;) {
                    if (y2 + 1 >= ny) break;
                    bool ok = true;
                    for (int xx = x; xx <= x2 && ok; ++xx) {
                        const int base = xx * sx + (y2 + 1) * sy;
                        for (int zz = z; zz <= z2; ++zz) {
                            const int j = base + zz;
                            if (!todo[j] || vcolor[j] != col) { ok = false; break; }
                        }
                    }
                    if (!ok) break;
                    ++y2;
                }

                // mark consumed
                for (int xx = x; xx <= x2; ++xx)
                    for (int yy = y; yy <= y2; ++yy)
                        memset(&todo[xx * sx + yy * sy + z], 0, size_t(z2 - z + 1));

                if (count >= max_boxes) return -1;
                out_lo[count * 3 + 0] = x;
                out_lo[count * 3 + 1] = y;
                out_lo[count * 3 + 2] = z;
                out_hi[count * 3 + 0] = x2 + 1;
                out_hi[count * 3 + 1] = y2 + 1;
                out_hi[count * 3 + 2] = z2 + 1;
                out_color[count] = col;
                ++count;
            }
        }
    }
    return count;
}

// 2D improved Perlin noise with octave accumulation (siv::PerlinNoise
// semantics as used by scenario_collect.cpp:62-77). perm: 512-entry table.
static inline double mvn_fade(double t) {
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0);
}

static inline double mvn_grad(int64_t h, double x, double y) {
    h &= 7;
    const double u = (h < 4) ? x : y;
    const double v = (h < 4) ? y : x;
    return ((h & 1) ? -u : u) + 2.0 * ((h & 2) ? -v : v);
}

void mvn_perlin_octave_0_1(const int64_t* perm, const double* xs,
                           const double* ys, int n, int octaves,
                           double* out) {
    for (int i = 0; i < n; ++i) {
        double total = 0.0, amp = 1.0;
        double fx = xs[i], fy = ys[i];
        for (int o = 0; o < (octaves < 1 ? 1 : octaves); ++o) {
            const double flx = std::floor(fx), fly = std::floor(fy);
            const int64_t xi = int64_t(flx) & 255, yi = int64_t(fly) & 255;
            const double xf = fx - flx, yf = fy - fly;
            const double u = mvn_fade(xf), v = mvn_fade(yf);
            const int64_t aa = perm[perm[xi] + yi];
            const int64_t ab = perm[perm[xi] + yi + 1];
            const int64_t ba = perm[perm[xi + 1] + yi];
            const int64_t bb = perm[perm[xi + 1] + yi + 1];
            const double g_aa = mvn_grad(aa, xf, yf);
            const double g_ba = mvn_grad(ba, xf - 1, yf);
            const double g_ab = mvn_grad(ab, xf, yf - 1);
            const double g_bb = mvn_grad(bb, xf - 1, yf - 1);
            const double x1 = g_aa + u * (g_ba - g_aa);
            const double x2 = g_ab + u * (g_bb - g_ab);
            const double val = (x1 + v * (x2 - x1)) / 2.0;
            total += val * amp;
            fx *= 2.0; fy *= 2.0;
            amp *= 0.5;
        }
        double r = total * 0.5 + 0.5;
        out[i] = r < 0.0 ? 0.0 : (r > 1.0 ? 1.0 : r);
    }
}
// ---------------------------------------------------------------------------
// Conservative 2D cell-to-cell visibility (PVS) over honeycomb maze cells.
//
// The renderer's per-tile frustum culling cannot see corridor occlusion: in a
// hex maze most walls survive the frustum test although only a handful are
// actually visible (measured HexMemory: ~67 rows/tile survive, <5 visible).
// Because every wall of one maze has the SAME height, any ray that hits a
// wall (or any geometry fully below the wall-top plane) stays below that
// plane for its whole flight, so 3D visibility of those rows from an eye
// below the tops reduces EXACTLY to 2D visibility among the wall footprints.
// This computes, per source cell, which cells any eye in that cell could
// possibly see — conservative: a cell is excluded only when no sightline
// through the open portal sequence can exist.
//
// Method: DFS over portal (open-edge) sequences from each source cell. A
// sequence is viable iff some straight line crosses every portal segment in
// it; cells are convex, so crossing points chain monotonically and the
// order-free "stabbing line through all segments" condition is exact.
// Feasibility uses the classic extreme-line argument — if any stabbing line
// exists, one passes through two portal endpoints — with the candidate set
// maintained incrementally down the DFS (filter by the new portal; add
// pairs involving its endpoints).
//
// Two sound prunes keep the search small in open (high wall-omission) areas:
//  * direction cone: a honeycomb has 6 edge-normal directions, and every
//    portal a straight line crosses is crossed FORWARD, so the sequence's
//    normal directions fit an open half-plane = at most 3 CONSECUTIVE of
//    the 6. Tracked as a 6-bit set with a precomputed validity table.
//  * coverage: past a portal, the line stays on the far side of that
//    portal's infinite line; if every cell over there is already marked,
//    recursion cannot add anything.
//
// Conservative safeguards (all err toward "visible"): portal segments are
// extended by EXT beyond their endpoints, crossing tests accept within EPS,
// sequences of <= 2 portals are always viable, and a source whose node
// budget runs out gets an all-visible row.
//
// The caller (megaverse_tpu/scenarios/hex.py) derives per-render-row
// bitmasks from the cell matrix; the device culling prologue ANDs them into
// the per-tile survival bits. Tests assert the PVS-culled image is
// bit-identical to the unculled one and that this matches the numpy
// reference implementation (megaverse_tpu/utils/pvs.py).
namespace {

struct PvsPt { double x, y; };

struct PvsLine {
    double a, b, c;  // unit-normal line: a*x + b*y + c = 0
    bool ok;
};

static inline PvsLine pvs_line(PvsPt p, PvsPt q) {
    double dx = q.x - p.x, dy = q.y - p.y;
    double n = std::hypot(dx, dy);
    PvsLine l;
    if (n < 1e-9) { l.ok = false; return l; }
    l.a = -dy / n; l.b = dx / n;
    l.c = -(l.a * p.x + l.b * p.y);
    l.ok = true;
    return l;
}

static inline bool pvs_crosses(const PvsLine& l, PvsPt s0, PvsPt s1) {
    const double EPS = 1e-7;
    double f0 = l.a * s0.x + l.b * s0.y + l.c;
    double f1 = l.a * s1.x + l.b * s1.y + l.c;
    return (f0 <= EPS && f1 >= -EPS) || (f1 <= EPS && f0 >= -EPS);
}

constexpr int PVS_MAX_DEPTH = 40;
constexpr int PVS_MAX_CAND = 64;

struct PvsCtx {
    int n_cells;
    int vwords;                // ceil(n_cells / 64)
    const int32_t* neigh;      // [C, 6]
    const uint8_t* open;       // [C, 6]
    const uint64_t* beyond;    // [C*6, vwords] cells with any point past the
                               // directed edge's line (forward half-plane)
    const uint8_t* conevalid;  // [64] is this 6-bit direction set within an
                               // open half-plane?
    uint8_t* vis;              // [C, C]
    uint64_t* visbits;         // [vwords] bitset mirror of vis[src]
    long long budget;          // per-source node budget, decremented
    int src;
    int depth;                 // current sequence length
    PvsPt pts[2 * PVS_MAX_DEPTH + 2];     // endpoints of current sequence
    PvsPt seg0[PVS_MAX_DEPTH + 1];
    PvsPt seg1[PVS_MAX_DEPTH + 1];
    PvsLine cand[PVS_MAX_DEPTH + 1][PVS_MAX_CAND];
    int ncand[PVS_MAX_DEPTH + 1];         // -1: overflowed (rebuild on use)
    const PvsPt* e0;           // [C, 6] portal endpoints (extended)
    const PvsPt* e1;
};

// All-pairs rebuild of the feasible two-endpoint candidate set for the
// current sequence PLUS candidate portal (a, b). Exact: if any stabbing
// line of the k+1 segments exists, an extreme one through two endpoints
// does. n_out = -1 on overflow (feasible, but untracked: rebuild on use).
static bool pvs_rebuild(const PvsCtx& c, int k, PvsPt a, PvsPt b,
                        PvsLine* out, int* n_out) {
    const int np = 2 * k + 2;
    bool feasible = false;
    int n = 0;
    PvsPt allp[2 * PVS_MAX_DEPTH + 4];
    for (int i = 0; i < 2 * k; ++i) allp[i] = c.pts[i];
    allp[2 * k] = a; allp[2 * k + 1] = b;
    for (int p = 0; p < np; ++p)
        for (int q = p + 1; q < np; ++q) {
            PvsLine l = pvs_line(allp[p], allp[q]);
            if (!l.ok) continue;
            bool hit = pvs_crosses(l, a, b);
            for (int s = k - 1; hit && s >= 0; --s)
                hit = pvs_crosses(l, c.seg0[s], c.seg1[s]);
            if (!hit) continue;
            feasible = true;
            if (n >= 0) {
                if (n < PVS_MAX_CAND) out[n++] = l;
                else n = -1;  // overflow: stop tracking
            }
        }
    *n_out = n;
    return feasible;
}

static bool pvs_dfs(PvsCtx& c, int cell, int dirset) {
    const int k = c.depth;
    if (k >= PVS_MAX_DEPTH) return true;
    if (--c.budget < 0) return false;  // aborts this source only
    for (int n = 0; n < 6; ++n) {
        const int j = c.neigh[cell * 6 + n];
        if (j < 0 || !c.open[cell * 6 + n]) continue;
        // direction-cone prune: slot n's outward normal direction is n
        // itself (NEIGH order); the accumulated set must stay inside an
        // open half-plane or no single straight line can cross all portals
        const int nset = dirset | (1 << n);
        if (!c.conevalid[nset]) continue;
        const PvsPt a = c.e0[cell * 6 + n], b = c.e1[cell * 6 + n];

        bool feasible;
        PvsLine* child = c.cand[k + 1];
        int nchild = 0;
        if (k < 2) {
            feasible = true;  // any two segments admit a stabbing line
        } else if (k == 2 || c.ncand[k] < 0) {
            feasible = pvs_rebuild(c, k, a, b, child, &nchild);
        } else {
            // incremental: parent candidates already cross the first k
            // portals — filter by the new one, then add pairs through the
            // new endpoints
            feasible = false;
            for (int i = 0; i < c.ncand[k]; ++i)
                if (pvs_crosses(c.cand[k][i], a, b)) {
                    feasible = true;
                    if (nchild >= 0) {
                        if (nchild < PVS_MAX_CAND) child[nchild++] = c.cand[k][i];
                        else nchild = -1;
                    }
                }
            const int npts = 2 * k;
            for (int e = 0; e < 2 * npts + 1; ++e) {
                PvsLine l = (e < npts)       ? pvs_line(a, c.pts[e])
                            : (e < 2 * npts) ? pvs_line(b, c.pts[e - npts])
                                             : pvs_line(a, b);
                if (!l.ok || !pvs_crosses(l, a, b)) continue;
                bool hit = true;
                for (int s = k - 1; hit && s >= 0; --s)
                    hit = pvs_crosses(l, c.seg0[s], c.seg1[s]);
                if (!hit) continue;
                feasible = true;
                if (nchild >= 0) {
                    if (nchild < PVS_MAX_CAND) child[nchild++] = l;
                    else nchild = -1;
                }
            }
        }
        if (!feasible) continue;

        if (!c.vis[c.src * c.n_cells + j]) {
            c.vis[c.src * c.n_cells + j] = 1;
            c.visbits[j >> 6] |= 1ull << (j & 63);
        }

        // coverage prune (see header comment)
        const uint64_t* bey = c.beyond + size_t(cell * 6 + n) * c.vwords;
        bool uncovered = false;
        for (int w = 0; w < c.vwords && !uncovered; ++w)
            uncovered = (bey[w] & ~c.visbits[w]) != 0;
        if (!uncovered) continue;

        c.pts[2 * k] = a; c.pts[2 * k + 1] = b;
        c.seg0[k] = a; c.seg1[k] = b;
        c.ncand[k + 1] = nchild;
        c.depth = k + 1;
        const bool ok = pvs_dfs(c, j, nset);
        c.depth = k;
        if (!ok) return false;
    }
    return true;
}

}  // namespace

// edge_pts: [C, 6, 4] portal endpoint coords (x0,y0,x1,y1) per cell edge;
// neigh [C,6] i32 (-1: none), open [C,6] u8. vis: [C, C] out. node_budget
// is PER SOURCE; a source that exhausts it gets an all-visible row
// (conservative — happens only in very open areas where most cells are
// genuinely visible anyway). Returns the number of sources computed exactly.
int mvn_hex_pvs(int n_cells, const int32_t* neigh, const uint8_t* open,
                const double* edge_pts, long long node_budget,
                uint8_t* vis) {
    const double EXT = 1e-4;  // portal extension beyond endpoints
    std::vector<PvsPt> e0(n_cells * 6), e1(n_cells * 6);
    for (int i = 0; i < n_cells; ++i)
        for (int n = 0; n < 6; ++n) {
            PvsPt p{edge_pts[(i * 6 + n) * 4 + 0], edge_pts[(i * 6 + n) * 4 + 1]};
            PvsPt q{edge_pts[(i * 6 + n) * 4 + 2], edge_pts[(i * 6 + n) * 4 + 3]};
            const double dx = q.x - p.x, dy = q.y - p.y;
            e0[i * 6 + n] = PvsPt{p.x - dx * EXT, p.y - dy * EXT};
            e1[i * 6 + n] = PvsPt{q.x + dx * EXT, q.y + dy * EXT};
        }

    // valid direction sets: subsets of 3 CONSECUTIVE directions (mod 6) —
    // exactly the 6-direction sets that fit in an open half-plane
    uint8_t conevalid[64] = {0};
    for (int s = 0; s < 64; ++s)
        for (int base = 0; base < 6 && !conevalid[s]; ++base) {
            const int cone = (1 << base) | (1 << ((base + 1) % 6))
                           | (1 << ((base + 2) % 6));
            if ((s & ~cone) == 0) conevalid[s] = 1;
        }

    // forward half-plane cover sets (coverage prune): cell c is "beyond"
    // directed edge (i, n) when any point of its hexagon lies past the
    // edge's infinite line toward the neighbor — via center distance with
    // circumradius + margin slack.
    const int vw = (n_cells + 63) / 64;
    std::vector<PvsPt> ctr(n_cells);
    for (int i = 0; i < n_cells; ++i) {
        double sx = 0, sy = 0;
        for (int n = 0; n < 6; ++n) {
            sx += edge_pts[(i * 6 + n) * 4 + 0] + edge_pts[(i * 6 + n) * 4 + 2];
            sy += edge_pts[(i * 6 + n) * 4 + 1] + edge_pts[(i * 6 + n) * 4 + 3];
        }
        ctr[i] = PvsPt{sx / 12.0, sy / 12.0};
    }
    std::vector<uint64_t> beyond(size_t(n_cells) * 6 * vw, 0);
    for (int i = 0; i < n_cells; ++i)
        for (int n = 0; n < 6; ++n) {
            const int j = neigh[i * 6 + n];
            if (j < 0 || !open[i * 6 + n]) continue;
            PvsLine l = pvs_line(e0[i * 6 + n], e1[i * 6 + n]);
            if (!l.ok) continue;
            const double sj = l.a * ctr[j].x + l.b * ctr[j].y + l.c;
            const double sgn = sj > 0 ? 1.0 : -1.0;
            uint64_t* row = beyond.data() + size_t(i * 6 + n) * vw;
            for (int cix = 0; cix < n_cells; ++cix) {
                const double sd =
                    sgn * (l.a * ctr[cix].x + l.b * ctr[cix].y + l.c);
                if (sd > -1.05) row[cix >> 6] |= 1ull << (cix & 63);
            }
        }

    std::memset(vis, 0, size_t(n_cells) * n_cells);
    std::vector<uint64_t> visbits(vw);
    auto c = std::make_unique<PvsCtx>();
    c->n_cells = n_cells;
    c->vwords = vw;
    c->neigh = neigh;
    c->open = open;
    c->beyond = beyond.data();
    c->conevalid = conevalid;
    c->vis = vis;
    c->visbits = visbits.data();
    c->e0 = e0.data();
    c->e1 = e1.data();

    int exact = 0;
    for (int src = 0; src < n_cells; ++src) {
        c->src = src;
        c->budget = node_budget;
        c->depth = 0;
        c->ncand[0] = 0;
        std::fill(visbits.begin(), visbits.end(), 0);
        vis[src * n_cells + src] = 1;
        visbits[src >> 6] |= 1ull << (src & 63);
        if (pvs_dfs(*c, src, 0)) ++exact;
        else std::memset(vis + size_t(src) * n_cells, 1, size_t(n_cells));
    }
    return exact;
}


// Sample points along 2D segments into voxel columns (hex maze wall
// voxelization): for each segment, mark vtype |= 1 over y rows [y0, y0+rows).
void mvn_voxelize_segments(uint8_t* vtype, int nx, int ny, int nz,
                           const double* segs /* [n,4] x1 z1 x2 z2 */,
                           int n_segs, double origin_x, double origin_z,
                           double voxel, int y0, int rows) {
    for (int s = 0; s < n_segs; ++s) {
        const double x1 = segs[s * 4 + 0], z1 = segs[s * 4 + 1];
        const double x2 = segs[s * 4 + 2], z2 = segs[s * 4 + 3];
        const double len = std::hypot(x2 - x1, z2 - z1);
        const int steps = std::max(2, int(len / (voxel * 0.4)) + 1);
        for (int i = 0; i < steps; ++i) {
            const double t = double(i) / double(steps - 1);
            const int ix = int(std::floor((x1 + (x2 - x1) * t - origin_x) / voxel));
            const int iz = int(std::floor((z1 + (z2 - z1) * t - origin_z) / voxel));
            if (ix < 0 || ix >= nx || iz < 0 || iz >= nz) continue;
            const int ylim = std::min(y0 + rows, ny);
            for (int y = std::max(y0, 0); y < ylim; ++y)
                vtype[(ix * ny + y) * nz + iz] |= 1;
        }
    }
}

}  // extern "C"
