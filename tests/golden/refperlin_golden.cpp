// Golden values for the siv::PerlinNoise replica
// (megaverse_tpu/utils/refperlin.py, tests/test_refperlin.py).
//
// Uses the reference's vendored header directly so the trace IS the
// reference's arithmetic. Prints the shuffled permutation head plus noise
// samples as %a hex doubles for bit-exact comparison.
//
// Build/run:
//   g++ -O2 -I /root/reference/src/libs/util/include \
//       -o /tmp/refperlin_golden tests/golden/refperlin_golden.cpp
#include <cstdio>
#include <random>
#include <algorithm>

#include "util/perlin_noise.hpp"

int main() {
    for (unsigned seed : {0u, 1u, 42u, 999999999u}) {
        // permutation head via the same reseed path
        std::uint8_t p[256];
        for (int i = 0; i < 256; ++i) p[i] = i;
        std::shuffle(std::begin(p), std::end(p),
                     std::default_random_engine(seed));
        std::printf("seed %u perm:", seed);
        for (int i = 0; i < 16; ++i) std::printf(" %d", p[i]);
        std::printf("\n");

        siv::PerlinNoise perlin(seed);
        std::printf("seed %u noise:", seed);
        for (double x : {0.3, 1.7, 13.49, 200.0, -3.2})
            std::printf(" %a", perlin.noise2D(x, 0.77 * x + 1.0));
        std::printf("\n");
        std::printf("seed %u acc:", seed);
        for (int oct : {1, 3, 9}) {
            // the Collect call shape: x / fx with fx = 42 / frequency
            double fx = 42.0 / 3.7, fz = 42.0 / 3.7;
            std::printf(" %a",
                        perlin.accumulatedOctaveNoise2D_0_1(7 / fx, 11 / fz, oct));
        }
        std::printf("\n");
    }
    return 0;
}
