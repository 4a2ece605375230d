// Golden trace of the reference TowerBuilding episode draw sequence
// (scenario_tower_building.cpp:129-153 reset + TowerBuildingPlatform::init
// cpp:19-103 + DefaultScenario::spawnAgents scenario_default.hpp:86),
// replicated draw-for-draw against real libstdc++. Validates
// TowerBuildingScenario.generate_ref's stream consumption. Output pasted
// into tests/test_refrng_scenarios.py. Rebuild:
//   g++ -O2 -o /tmp/tower_golden tests/golden/tower_golden.cpp && /tmp/tower_golden
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

// env/include/env/const.hpp:121-137 layoutColors as palette indices; index
// of BUILDING_ZONE's color (DARK_GREY) mirrors megaverse_tpu LAYOUT_COLORS.
static const int NUM_LAYOUT_COLORS = 14;

int main() {
    const int numAgents = 2;
    // Env::reset seed chain: env rng seeded with 7, then per-episode reseed
    Rng rng((unsigned long)7);
    int seed = randRange(0, 1 << 30, rng);
    rng.seed((unsigned long)seed);
    printf("EP_SEED = %d\n", seed);

    // reset(): layoutColor (reject BUILDING_ZONE == layout color idx 8..13?
    // BUILDING_ZONE is DARK_GREY which appears at indices 10..13 of the
    // layout list; the engine rejects by VALUE). Emit raw indices plus the
    // reject decisions so Python replays them with its own palette mapping.
    std::vector<int> colorIdxDraws;
    // we don't know rejects here without the palette; emulate with the same
    // rule as the Python side: DARK_GREY occupies list slots 10..13.
    auto isBuildingZone = [](int idx) { return idx >= 10; };
    int lcIdx = randRange(0, NUM_LAYOUT_COLORS, rng);
    colorIdxDraws.push_back(lcIdx);
    while (isBuildingZone(lcIdx)) {
        lcIdx = randRange(0, NUM_LAYOUT_COLORS, rng);
        colorIdxDraws.push_back(lcIdx);
    }
    printf("LC_DRAWS = [");
    for (int v : colorIdxDraws) printf("%d, ", v);
    printf("]\n");

    // TowerBuildingPlatform::init
    int height = randRange(5, 7, rng);
    int length = randRange(12, 30, rng);
    int width = randRange(12, 25, rng);
    int bzL = randRange(3, 9, rng);
    int bzW = randRange(3, 9, rng);
    int matL = randRange(2, 8, rng);
    int matW = randRange(2, 8, rng);
    length = std::max(bzL + matL + 3, length);
    width = std::max(bzW + matW + 3, width);
    int bzX = randRange(1, length - bzL - 1, rng);
    int bzZ = randRange(1, width - bzW - 1, rng);
    int matX = randRange(1, length - matL - 1, rng);
    int matZ = randRange(1, width - matW - 1, rng);
    printf("DIMS = [%d, %d, %d, %d, %d, %d, %d, %d, %d, %d, %d]\n",
           height, length, width, bzL, bzW, matL, matW, bzX, bzZ, matX, matZ);

    struct VC { int x, y, z; };
    std::vector<VC> cand;
    for (int x = 1; x < length - 1; ++x)
        for (int z = 1; z < width - 1; ++z)
            cand.push_back({x, 2, z});
    std::shuffle(cand.begin(), cand.end(), rng);
    printf("CAND_HEAD = [");
    for (int i = 0; i < 8; ++i) printf("(%d,%d,%d), ", cand[i].x, cand[i].y, cand[i].z);
    printf("]\n");

    const int maxRandomObjects = std::min(int(cand.size()) - numAgents, 25);
    const int spawnObjects = randRange(0, std::max(1, maxRandomObjects), rng);
    printf("N_OBJECTS = %d\n", spawnObjects);

    // vg.addPlatform(..., randomLayoutColor, randomBool)
    int wallIdx = randRange(0, NUM_LAYOUT_COLORS, rng);
    int drawWalls = randRange(0, 2, rng);
    printf("WALL_IDX = %d\nDRAW_WALLS = %d\n", wallIdx, drawWalls);

    // spawnAgents yaws
    printf("YAWS = [");
    for (int i = 0; i < numAgents; ++i)
        printf("%.9g, ", frand(rng) * 3.14159265358979323846f * 2);
    printf("]\n");
    return 0;
}
