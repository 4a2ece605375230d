// Golden trace for Football reference-stream parity
// (tests/test_refrng_scenarios.py::test_football_reference_stream_layout).
// Mirrors FootballLayout::init (scenario_football.cpp:16-22) +
// Platform::agentSpawnPoints (platforms.hpp:221-244) + spawnAgents yaws.
// Build/run: g++ -O2 -o /tmp/football_golden tests/golden/football_golden.cpp
#include <cstdio>
#include <map>
#include <random>
#include <set>

using Rng = std::mt19937;
static int randRange(int low, int high, Rng &rng) {
    return std::uniform_int_distribution<>{low, high - 1}(rng);
}
static float frand(Rng &rng) {
    return std::uniform_real_distribution<float>{0, 1}(rng);
}

int main() {
    const int NUM_AGENTS = 2;
    Rng rng(7);
    unsigned seed = randRange(0, 1 << 30, rng);
    rng.seed(seed);

    int length = randRange(14, 24, rng);
    int width = randRange(12, 24, rng);
    int height = randRange(3, 7, rng);
    std::printf("epseed %u dims %d %d %d\n", seed, length, width, height);

    std::set<std::pair<int, int>> used;
    std::map<std::pair<int, int>, int> occupancy;
    std::printf("spawns:");
    for (int i = 0; i < NUM_AGENTS; ++i) {
        for (int attempt = 0; attempt < 10; ++attempt) {
            int x = randRange(1, length - 1, rng);
            int z = randRange(1, width - 1, rng);
            if (used.count({x, z})) continue;
            int y = occupancy[{x, z}] + 1;
            occupancy[{x, z}] += 2;
            used.emplace(x, z);
            std::printf(" %d %d %d", x, y, z);
            break;
        }
    }
    std::printf("\nyaws:");
    for (int i = 0; i < NUM_AGENTS; ++i)
        std::printf(" %.9g", frand(rng) * 3.14159265358979323846f * 2);
    std::printf("\n");
    return 0;
}
