// Golden trace for BoxAGone reference-stream parity
// (tests/test_refrng_scenarios.py::test_boxagone_reference_stream_layout).
// Mirrors BoxAGoneScenario::reset draws (scenario_box_a_gone.cpp:41-96) +
// spawnAgents yaws (scenario_default.hpp:86).
// Build/run: g++ -O2 -o /tmp/boxagone_golden tests/golden/boxagone_golden.cpp
#include <algorithm>
#include <cstdio>
#include <random>
#include <vector>

using Rng = std::mt19937;
static int randRange(int low, int high, Rng &rng) {
    return std::uniform_int_distribution<>{low, high - 1}(rng);
}
static float frand(Rng &rng) {
    return std::uniform_real_distribution<float>{0, 1}(rng);
}

int main() {
    const int NUM_AGENTS = 2, platformSize = 24;
    Rng rng(7);
    unsigned seed = randRange(0, 1 << 30, rng);
    rng.seed(seed);
    std::printf("epseed %u\n", seed);

    const int numLevels = randRange(2, 4, rng);
    std::printf("levels %d\n", numLevels);
    struct V { int x, y, z; };
    std::vector<V> spawns;
    int h = 1;
    for (int level = 0; level < numLevels; ++level) {
        h += randRange(2, 4, rng);
        const int ll = randRange(10, 19, rng);
        const int lw = randRange(10, 19, rng);
        const int sx = platformSize / 2 - ll / 2, sz = platformSize / 2 - lw / 2;
        const float skipProb = frand(rng) * 0.2f;
        int count = 0;
        std::printf("level %d h %d ll %d lw %d skip %a tiles:", level, h, ll,
                    lw, double(skipProb));
        for (int x = sx; x < sx + ll; ++x)
            for (int z = sz; z < sz + lw; ++z) {
                if (frand(rng) < skipProb) continue;
                ++count;
                std::printf(" %d,%d", x, z);
                if (level == numLevels - 1) spawns.push_back({x, h, z});
            }
        std::printf("\n");
    }
    while (int(spawns.size()) < NUM_AGENTS) spawns.push_back(spawns[0]);
    std::shuffle(spawns.begin(), spawns.end(), rng);
    std::printf("spawns:");
    for (int i = 0; i < NUM_AGENTS; ++i)
        std::printf(" %d %d %d", spawns[i].x, spawns[i].y, spawns[i].z);
    std::printf("\nyaws:");
    for (int i = 0; i < NUM_AGENTS; ++i)
        std::printf(" %.9g", frand(rng) * 3.14159265358979323846f * 2);
    std::printf("\n");
    return 0;
}
