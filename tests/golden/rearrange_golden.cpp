// Golden trace for Rearrange reference-stream parity
// (tests/test_refrng_scenarios.py::test_rearrange_reference_stream_layout).
// Mirrors RearrangeScenario::reset (scenario_rearrange.cpp:46-124),
// agentStartingPositions (cpp:216-236), spawnAgents yaws, and the
// interactive-copy placement (cpp:215-233), with libstdc++ primitives.
// Build/run: g++ -O2 -o /tmp/rearrange_golden tests/golden/rearrange_golden.cpp
#include <algorithm>
#include <cmath>
#include <cstdio>
#include <queue>
#include <random>
#include <set>
#include <tuple>
#include <vector>

using Rng = std::mt19937;
static int randRange(int low, int high, Rng &rng) {
    return std::uniform_int_distribution<>{low, high - 1}(rng);
}
static bool randomBool(Rng &rng) { return bool(randRange(0, 2, rng)); }
static float frand(Rng &rng) {
    return std::uniform_real_distribution<float>{0, 1}(rng);
}

struct V { int x, y, z; };
static bool operator<(const V &a, const V &b) {
    return std::tie(a.x, a.y, a.z) < std::tie(b.x, b.y, b.z);
}
static V operator+(const V &a, const V &b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static V operator-(const V &a, const V &b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }

struct Item { int shape, color; V off; };

int main() {
    const int NUM_AGENTS = 2, NUM_OBJECT_COLORS = 14;
    const int length = 19, width = 14;
    const V leftC{5, 2, 5}, rightC{13, 2, 5};
    Rng rng(7);
    unsigned seed = randRange(0, 1 << 30, rng);
    rng.seed(seed);

    int height = randRange(4, 7, rng);
    int walls = randomBool(rng) ? 1 : 0;
    std::printf("epseed %u height %d walls %d\n", seed, height, walls);

    auto randomItem = [&](V off) {
        int shape = randRange(0, 4, rng);          // randomSample(shapes)
        int color = randRange(0, NUM_OBJECT_COLORS, rng);
        return Item{shape, color, off};
    };

    const int arrangementSize = randRange(2, 8, rng);
    std::queue<Item> q;
    std::set<V> used;
    std::vector<Item> items;
    auto first = randomItem({0, 0, 0});
    q.push(first);
    items.push_back(first);
    used.insert({0, 0, 0});
    std::vector<V> directions{{-1, 0, 0}, {1, 0, 0}, {0, 1, 0}, {0, 0, -1}, {0, 0, 1}};
    while (!q.empty()) {
        auto curr = q.front();
        q.pop();
        int maxBranches = randRange(1, int(directions.size()) + 1, rng);
        maxBranches = randRange(1, maxBranches + 1, rng);
        int numBranches = 0;
        std::shuffle(directions.begin(), directions.end(), rng);
        for (auto dir : directions) {
            const auto off = curr.off + dir;
            const auto below = off - V{0, 1, 0};
            if (off.y >= 2 || abs(off.x) >= 2 || abs(off.z) >= 2) continue;
            if (used.count(off)) continue;
            if (!(off.y == 0 || used.count(below))) continue;
            auto item = randomItem(off);
            q.push(item);
            items.push_back(item);
            used.insert(off);
            ++numBranches;
            if (numBranches >= maxBranches) break;
            if (int(items.size()) >= arrangementSize) break;
        }
        if (int(items.size()) >= arrangementSize) break;
    }
    std::printf("items %zu:", items.size());
    for (auto &it : items)
        std::printf(" %d %d %d %d %d", it.shape, it.color, it.off.x, it.off.y, it.off.z);
    std::printf("\n");

    std::printf("spawns:");
    for (int i = 0; i < NUM_AGENTS; ++i) {
        for (int attempt = 0; attempt < 20; ++attempt) {
            int ax = randRange(2, length - 1, rng);
            int az = randRange(2, width - 1, rng);
            if (fabs(ax - leftC.x) < 2 && fabs(az - leftC.z) < 2) continue;
            if (fabs(ax - rightC.x) < 2 && fabs(az - rightC.z) < 2) continue;
            std::printf(" %d %d", ax, az);
            break;
        }
    }
    std::printf("\nyaws:");
    for (int i = 0; i < NUM_AGENTS; ++i)
        std::printf(" %.9g", frand(rng) * 3.14159265358979323846f * 2);
    std::printf("\n");

    // interactive copy
    std::set<V> occupied;
    for (auto &it : items) occupied.insert(it.off);
    int numUnmoved = randRange(0, int(items.size()), rng);
    std::printf("unmoved %d offs:", numUnmoved);
    int placed = 0;
    for (auto &it : items) {
        V off = it.off;
        if (placed >= numUnmoved) {
            while (occupied.count(off))
                off = V{randRange(-2, 3, rng), 0, randRange(-2, 3, rng)};
            occupied.insert(off);
        }
        std::printf(" %d %d %d", off.x, off.y, off.z);
        ++placed;
    }
    std::printf("\n");
    return 0;
}
