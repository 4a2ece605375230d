// Golden-value generator for Sokoban reference-stream parity
// (tests/test_refrng_scenarios.py::test_sokoban_reference_stream).
//
// Replicates the reference's per-reset draw sequence
// (scenario_sokoban.cpp: reset -> reloadLevels -> createLayout;
// scenario_default.hpp:80-97 spawnAgents) with the same libstdc++
// primitives the engine uses (util.hpp:25-55):
//   episode reseed: seed' = uniform_int<>{0, 2^30-1}(rng); rng.seed(seed')
//   on empty cache: fileIdx = uniform_int<>{0, NUM_FILES-1}(rng);
//                   std::shuffle(levels(NUM_LEVELS ids), rng)
//   every reset:    pop back; floorColor = uniform_int<>{0, 4}(rng);
//                   per agent yaw = uniform_real<float>{0,1}(rng) * pi * 2
//
// Build/run:  g++ -O2 -o /tmp/soko_golden tests/golden/sokoban_golden.cpp
//             /tmp/soko_golden
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <numeric>
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
    const int ENV_SEED = 7;
    const int NUM_FILES = 1000;
    const int NUM_LEVELS = 3;  // small cache so the test exercises a refill
    const int NUM_AGENTS = 2;
    const int NUM_RESETS = 4;  // cache of 3 -> refill happens on reset 4

    Rng rng(ENV_SEED);
    std::vector<int> levels;

    for (int ep = 0; ep < NUM_RESETS; ++ep) {
        unsigned seed = randRange(0, 1 << 30, rng);  // env.cpp:61-63
        rng.seed(seed);
        std::printf("ep %d seed %u", ep, seed);
        if (levels.empty()) {
            int fileIdx = randRange(0, NUM_FILES, rng);
            levels.resize(NUM_LEVELS);
            std::iota(levels.begin(), levels.end(), 0);
            std::shuffle(levels.begin(), levels.end(), rng);
            std::printf(" file %d order", fileIdx);
            for (int v : levels) std::printf(" %d", v);
        }
        int level = levels.back();
        levels.pop_back();
        int floorColor = randRange(0, 5, rng);
        std::printf(" level %d floor %d yaws", level, floorColor);
        for (int a = 0; a < NUM_AGENTS; ++a) {
            float yaw = frand(rng) * 3.14159265358979323846f * 2;
            std::printf(" %.9g", yaw);
        }
        std::printf("\n");
    }
    return 0;
}
