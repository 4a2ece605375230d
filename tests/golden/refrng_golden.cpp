// Golden-vector generator for the reference-stream RNG parity layer
// (megaverse_tpu/utils/refrng.py). Exercises exactly the primitives the
// reference engine uses (util/include/util/util.hpp:25-49 randRange/frand,
// std::shuffle, and the seed chain megaverse.cpp:60-69 / env.cpp:61-63)
// against the real libstdc++ <random>. Output is pasted into
// tests/test_refrng.py as literals; rebuild with:
//   g++ -O2 -o /tmp/refrng_golden tests/golden/refrng_golden.cpp && /tmp/refrng_golden
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
    // raw engine words
    {
        Rng rng(42);
        printf("RAW42 = [");
        for (int i = 0; i < 8; ++i) printf("%u, ", rng());
        printf("]\n");
        Rng d;  // default seed 5489
        printf("RAWDEF = [");
        for (int i = 0; i < 4; ++i) printf("%u, ", d());
        printf("]\n");
        Rng big(42);
        for (int i = 0; i < 1500; ++i) big();  // across two twists
        printf("RAW42_1500 = [");
        for (int i = 0; i < 4; ++i) printf("%u, ", big());
        printf("]\n");
    }
    // randRange over assorted ranges (interleaved draws share one stream)
    {
        Rng rng(123);
        printf("RR123 = [");
        int los[6] = {0, 0, 5, -3, 0, 2};
        int his[6] = {2, 10, 7, 4, 1000000, 30};
        for (int k = 0; k < 24; ++k)
            printf("%d, ", randRange(los[k % 6], his[k % 6], rng));
        printf("]\n");
    }
    // frand
    {
        Rng rng(7);
        printf("FR7 = [");
        for (int i = 0; i < 12; ++i) printf("%.9g, ", frand(rng));
        printf("]\n");
    }
    // shuffle (odd and even lengths, then dependent draws)
    {
        Rng rng(99);
        std::vector<int> v7{0, 1, 2, 3, 4, 5, 6};
        std::shuffle(v7.begin(), v7.end(), rng);
        printf("SH7 = [");
        for (int x : v7) printf("%d, ", x);
        printf("]\n");
        std::vector<int> v8{0, 1, 2, 3, 4, 5, 6, 7};
        std::shuffle(v8.begin(), v8.end(), rng);
        printf("SH8 = [");
        for (int x : v8) printf("%d, ", x);
        printf("]\n");
        std::vector<int> v100(100);
        for (int i = 0; i < 100; ++i) v100[i] = i;
        std::shuffle(v100.begin(), v100.end(), rng);
        printf("SH100_HEAD = [");
        for (int i = 0; i < 16; ++i) printf("%d, ", v100[i]);
        printf("]\n");
        printf("AFTER_SH = %d\n", randRange(0, 1000000, rng));
    }
    // seed chain: master fan-out + per-episode reseed
    {
        Rng master((unsigned long)42);
        printf("ENVSEEDS42 = [");
        for (int i = 0; i < 8; ++i) printf("%d, ", randRange(0, 1 << 30, master));
        printf("]\n");
        Rng env((unsigned long)7);
        printf("EPSEEDS = [");
        for (int e = 0; e < 4; ++e) {
            int seed = randRange(0, 1 << 30, env);
            env.seed((unsigned long)seed);
            printf("%d, ", seed);
        }
        printf("]\n");
        // a draw after the final reseed (validates the reseeded state)
        printf("EP_AFTER = %d\n", randRange(0, 1000, env));
    }
    return 0;
}
