// Golden trace for Collect reference-stream layout parity
// (tests/test_refrng_scenarios.py::test_collect_reference_stream_layout).
//
// Replicates CollectScenario::reset's draw sequence verbatim
// (scenario_collect.cpp:35-143 createLandscape; scenario_default.hpp:86
// spawn yaws; scenario_collect.cpp:196-206 reward good/bad draws), using the
// reference's own vendored siv::PerlinNoise header, libstdc++
// mt19937/uniform distributions/std::shuffle/std::sort.
//
// Build/run:
//   g++ -O2 -I /root/reference/src/libs/util/include \
//       -o /tmp/collect_golden tests/golden/collect_golden.cpp
#include <algorithm>
#include <cstdio>
#include <random>
#include <vector>

#include "util/perlin_noise.hpp"

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
    unsigned seed = randRange(0, 1 << 30, rng);  // episode reseed
    rng.seed(seed);
    std::printf("epseed %u\n", seed);

    const int numLandscapeColors = 7, numFloorColors = 3;
    int landIdx = randRange(0, numLandscapeColors, rng);
    int floorIdx = randRange(0, numFloorColors, rng);

    constexpr int maxWidth = 42, maxLength = maxWidth;
    const int width = randRange(8, maxWidth, rng);
    const int length = randRange(8, maxWidth, rng);

    std::vector<int> spawnHeight(length * width, 1);
    double frequency = double(randRange(1, 100, rng)) / 10.0;
    const std::int32_t octaves = randRange(1, 10, rng);
    const std::uint32_t pseed = randRange(0, 1000000000, rng);
    const siv::PerlinNoise perlin(pseed);
    const double fx = maxLength / frequency;
    const double fz = maxWidth / frequency;
    const int intensity = randRange(5, 18, rng);
    const float groundLevel = frand(rng) * 0.5f + 0.2f;

    std::printf("cfg %d %d %d %d %.1f %d %u %d %a\n", landIdx, floorIdx,
                width, length, frequency, octaves, pseed, intensity,
                double(groundLevel));

    std::printf("heights:");
    for (int x = 1; x < length - 1; ++x)
        for (int z = 1; z < width - 1; ++z) {
            const double noise =
                perlin.accumulatedOctaveNoise2D_0_1(x / fx, z / fz, octaves);
            const double yCoord = intensity * (noise - groundLevel);
            int h = 0;
            if (yCoord >= 1) {
                h = int(lround(yCoord));
                spawnHeight[x * width + z] = h + 1;
            }
            std::printf(" %d", h);
        }
    std::printf("\n");

    struct V { int x, y, z; };
    std::vector<V> sp;
    for (int x = 1; x < length - 1; ++x)
        for (int z = 1; z < width - 1; ++z)
            sp.push_back({x, spawnHeight[x * width + z], z});
    std::shuffle(sp.begin(), sp.end(), rng);

    std::printf("agents:");
    for (int i = 0; i < NUM_AGENTS; ++i)
        std::printf(" %d %d %d", sp[i].x, sp[i].y, sp[i].z);
    std::printf("\n");
    size_t offset = NUM_AGENTS;

    int numRewards = randRange(1, int(lround(0.05 * width * length)) + 2, rng);
    numRewards = std::min(numRewards, int(sp.size()) - int(offset));
    int numRandom = std::max(numRewards / 2, 1);
    std::vector<V> rewards(sp.begin() + offset, sp.begin() + offset + numRandom);
    offset += numRandom;

    std::sort(sp.begin() + offset, sp.end(), [&](const V &a, const V &b) {
        int ha = spawnHeight[a.x * width + a.z];
        int hb = spawnHeight[b.x * width + b.z];
        if (ha != hb) return ha > hb;
        return false;
    });
    rewards.insert(rewards.end(), sp.begin() + offset,
                   sp.begin() + offset + (numRewards - numRandom));
    offset += numRewards - numRandom;

    std::shuffle(sp.begin() + offset, sp.end(), rng);
    auto objectsMin = std::max(3, int(length * width * 0.04));
    auto objectsMax = std::min(objectsMin + 1, int(lround(0.07 * width * length)) + 2);
    const int numObjects = std::min(randRange(objectsMin, objectsMax, rng),
                                    int(sp.size()) - int(offset));
    std::vector<V> objects;
    if (offset + numObjects < sp.size())
        objects.assign(sp.begin() + offset, sp.begin() + offset + numObjects);

    std::printf("rewards %d:", numRewards);
    for (auto &v : rewards) std::printf(" %d %d %d", v.x, v.y, v.z);
    std::printf("\nobjects %zu:", objects.size());
    for (auto &v : objects) std::printf(" %d %d %d", v.x, v.y, v.z);
    std::printf("\nyaws:");
    for (int i = 0; i < NUM_AGENTS; ++i)
        std::printf(" %.9g", frand(rng) * 3.14159265358979323846f * 2);
    std::printf("\ngood:");
    for (size_t i = 0; i < rewards.size(); ++i)
        std::printf(" %d", frand(rng) > 0.3f ? 1 : 0);
    std::printf("\n");
    return 0;
}
