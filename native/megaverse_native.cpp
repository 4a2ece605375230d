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
