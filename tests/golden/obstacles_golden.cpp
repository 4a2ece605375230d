// Golden trace for the Obstacles-family reference stream
// (tests/test_refrng_scenarios.py::test_obstacles_reference_stream_draws).
//
// Replicates every rng draw of ObstaclesScenario::reset for the default
// (Easy) params (scenario_obstacles.cpp:51-195 + the platform classes in
// platforms.hpp:306-557), WITHOUT geometry: the self-collision check is
// assumed to pass on attempt 0 (the Python side asserts the same seed
// generates on attempt 0). Prints the platform/dim sequence, spawn cells,
// yaws, and three post-generation probe draws — if any intermediate draw
// diverged, the probes cannot match.
//
// Build/run: g++ -O2 -o /tmp/obstacles_golden tests/golden/obstacles_golden.cpp
#include <algorithm>
#include <cstdio>
#include <array>
#include <map>
#include <random>
#include <set>
#include <vector>

using Rng = std::mt19937;
static int randRange(int low, int high, Rng &rng) {
    return std::uniform_int_distribution<>{low, high - 1}(rng);
}
static float frand(Rng &rng) {
    return std::uniform_real_distribution<float>{0, 1}(rng);
}
static int tri(int n) { return n * (n + 1) / 2; }

// params (ObstaclesEasy == defaults, scenario_obstacles.hpp:52-68)
static const int MIN_PLAT = 1, MAX_PLAT = 2, MIN_GAP = 1, MAX_GAP = 2,
                 MIN_LAVA = 1, MAX_LAVA = 4, MIN_H = 1, MAX_H = 3,
                 ALLOWED_MAXDIFF = 1;

struct Plat {
    char kind;  // S(tart) W L T(step) G A(transition) E(xit)
    int length = -1, width = -1, height = -1;
    int wallH = 0, lavaLen = 0, stepH = 0, gap = 0, gapX = 0;
    std::map<std::pair<int, int>, int> occupancy;

    void initEmpty(Rng &rng) {
        length = randRange(4, 10, rng);
        if (width == -1) width = randRange(5, 9, rng);
        height = 5;
    }
    bool maxDiff() const {
        if (kind == 'W') return wallH >= MAX_H;
        if (kind == 'T') return stepH >= MAX_H;
        if (kind == 'L') return lavaLen >= MAX_LAVA;
        return false;
    }
    int requiredBoxes() const {
        if (kind == 'W') return tri(wallH - 1);
        if (kind == 'T') return tri(stepH - 1);
        if (kind == 'L') return std::max(1, lavaLen - 1);
        if (kind == 'G') return tri(std::max(0, gap - 2));
        return 0;
    }
    void init(Rng &rng) {
        switch (kind) {
            case 'W':
                initEmpty(rng);
                wallH = randRange(MIN_H, MAX_H + 1, rng);
                height = randRange(wallH + 4, wallH + 6, rng);
                break;
            case 'L': {
                initEmpty(rng);
                length = randRange(6, 12, rng);
                int minLava = std::min(MIN_LAVA, length - 2);
                int maxLava = std::min(MAX_LAVA + 1, length - 1);
                lavaLen = randRange(minLava, maxLava, rng);
                break;
            }
            case 'T':
                initEmpty(rng);
                stepH = randRange(MIN_H, MAX_H + 1, rng);
                height = randRange(stepH + 2, stepH + 5, rng);
                break;
            case 'G':
                initEmpty(rng);
                gap = randRange(MIN_GAP, std::min(MAX_GAP + 1, length - 1), rng);
                gapX = randRange(1, length - gap, rng);
                break;
            case 'A':  // transition: height=5, dims preset
                height = 5;
                break;
            default:  // S / E / empty
                initEmpty(rng);
        }
    }
    void generate(Rng &rng) {
        if (kind == 'W') {
            int wallX = randRange(1, length, rng);
            int thick = randRange(1, length - wallX + 1, rng);
            for (int x = wallX; x < wallX + thick; ++x)
                for (int z = 1; z < width; ++z) occupancy[{x, z}] = wallH;
        } else if (kind == 'L') {
            (void)randRange(1, length - lavaLen, rng);  // lavaX
        } else if (kind == 'T') {
            int stepX = randRange(1, length, rng);
            for (int x = stepX + 1; x < length; ++x)
                for (int z = 1; z < width; ++z) occupancy[{x, z}] = stepH;
        }
    }
    std::vector<std::array<int, 3>> objectPositions(int n, Rng &rng) {
        std::vector<std::array<int, 3>> out;
        if (kind == 'G') {
            std::vector<std::pair<int, int>> cand;
            for (int x = 0; x < length; ++x)
                for (int z = 1; z < width - 1; ++z) {
                    if (x >= gapX && x < gapX + gap) continue;
                    cand.emplace_back(x, z);
                }
            for (int i = 0; i < n; ++i) {
                auto v = cand[randRange(0, int(cand.size()), rng)];
                int y = ++occupancy[{v.first, v.second}];
                out.push_back(std::array<int, 3>{v.first, y, v.second});
            }
            return out;
        }
        for (int i = 0; i < n; ++i) {
            for (int attempt = 0; attempt < 10; ++attempt) {
                int x = randRange(1, length - 1, rng);
                int z = randRange(1, width - 1, rng);
                if (occupancy[{x, z}] < 2 || attempt >= 9) {
                    int y = ++occupancy[{x, z}];
                    out.push_back(std::array<int, 3>{x, y, z});
                    break;
                }
            }
        }
        return out;
    }
};

int main() {
    const int NUM_AGENTS = 2;
    Rng rng(7);
    unsigned seed = randRange(0, 1 << 30, rng);
    rng.seed(seed);
    std::printf("epseed %u\n", seed);

    int drawWalls = randRange(0, 2, rng);
    int numPlatforms = randRange(MIN_PLAT, MAX_PLAT + 1, rng);
    std::printf("walls %d nplat %d\n", drawWalls, numPlatforms);

    const char types[4] = {'W', 'L', 'T', 'G'};
    std::vector<Plat> plats;
    Plat start{'S'};
    start.init(rng);
    start.generate(rng);
    plats.push_back(start);
    int requiredWidth = start.width;
    int prevWidth = start.width;
    int nMaxDiff = 0;

    for (int i = 0; i < numPlatforms; ++i) {
        int orient = randRange(0, 3, rng);  // STRAIGHT/LEFT/RIGHT
        int w = orient == 0 ? requiredWidth : -1;
        Plat p;
        bool first = true;
        while (first || (p.maxDiff() && nMaxDiff >= ALLOWED_MAXDIFF)) {
            first = false;
            p = Plat{types[randRange(0, 4, rng)]};
            p.width = w;
            p.init(rng);
        }
        if (p.maxDiff()) ++nMaxDiff;
        p.generate(rng);
        plats.push_back(p);
        if (orient != 0) {
            Plat t{'A'};
            t.length = p.width - 1;
            t.width = prevWidth;
            t.init(rng);
            t.generate(rng);
            plats.push_back(t);
        }
        prevWidth = p.width;
        requiredWidth = p.width;
    }
    Plat exitp{'E'};
    exitp.width = requiredWidth;
    exitp.init(rng);
    exitp.generate(rng);
    plats.push_back(exitp);

    std::printf("plats:");
    for (auto &p : plats)
        std::printf(" %c,%d,%d,%d", p.kind, p.length, p.width, p.height);
    std::printf("\n");

    int layoutColor = randRange(0, 14, rng);
    int wallColor = randRange(0, 14, rng);
    std::printf("colors %d %d\n", layoutColor, wallColor);

    // start platform agent spawn points (platforms.hpp:221-244)
    {
        auto &s = plats[0];
        std::set<std::pair<int, int>> used;
        std::printf("spawns:");
        for (int i = 0; i < NUM_AGENTS; ++i) {
            for (int attempt = 0; attempt < 10; ++attempt) {
                int x = randRange(1, s.length - 1, rng);
                int z = randRange(1, s.width - 1, rng);
                if (used.count({x, z})) continue;
                int y = s.occupancy[{x, z}] + 1;
                s.occupancy[{x, z}] += 2;
                used.emplace(x, z);
                std::printf(" %d %d %d", x, y, z);
                break;
            }
        }
        std::printf("\n");
    }

    // movable-box budget distribution (cpp:172-178)
    std::vector<int> numBoxes(plats.size(), 0);
    for (int i = 1; i < int(plats.size()); ++i) {
        int n = plats[i].requiredBoxes();
        for (int b = 0; b < n; ++b)
            ++numBoxes[randRange(std::max(0, i - 2), i, rng)];
    }
    // object positions per platform (cpp:180-186)
    int totalObjects = 0;
    for (int i = 0; i < int(plats.size()); ++i) {
        float fracc = frand(rng) * 0.5f;
        int extra = int(lround(fracc * numBoxes[i])) + randRange(0, 2, rng);
        totalObjects += int(plats[i].objectPositions(numBoxes[i] + extra, rng).size());
    }
    // bonus rewards (cpp:190-194)
    int totalRewards = 0;
    for (int i = 1; i < int(plats.size()) - 1; ++i) {
        int n = randRange(0, 2, rng);
        totalRewards += int(plats[i].objectPositions(n, rng).size());
    }
    std::printf("objects %d rewards %d\n", totalObjects, totalRewards);

    std::printf("yaws:");
    for (int i = 0; i < NUM_AGENTS; ++i)
        std::printf(" %.9g", frand(rng) * 3.14159265358979323846f * 2);
    int p0 = randRange(0, 1000000, rng);   // sequenced: printf arg
    int p1 = randRange(0, 1000000, rng);   // evaluation order is unspecified
    int p2 = randRange(0, 1000000, rng);
    std::printf("\nprobe: %d %d %d\n", p0, p1, p2);
    return 0;
}
