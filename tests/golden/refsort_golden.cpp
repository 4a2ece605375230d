// Golden permutations for the libstdc++ std::sort replica
// (megaverse_tpu/utils/refsort.py, tests/test_refsort.py).
//
// Sorts (key, original_index) pairs comparing KEYS ONLY (ties return false,
// like scenario_collect.cpp:124-132), with keys drawn from mt19937 % K so
// ties are frequent — the resulting index permutation pins the unstable
// introsort order. Sizes cross the insertion threshold (16), single
// partition, deep recursion, and the heapsort depth-limit fallback
// (many equal keys make quicksort degenerate at K=2).
//
// Build/run: g++ -O2 -o /tmp/refsort_golden tests/golden/refsort_golden.cpp
#include <algorithm>
#include <cstdio>
#include <random>
#include <vector>

int main() {
    const int sizes[] = {2, 5, 16, 17, 33, 100, 257, 1000};
    const int mods[] = {2, 5, 1000000};
    std::mt19937 rng(12345);
    for (int n : sizes) {
        for (int k : mods) {
            std::vector<std::pair<unsigned, int>> v;
            v.reserve(n);
            for (int i = 0; i < n; ++i)
                v.emplace_back(rng() % k, i);
            std::sort(v.begin(), v.end(),
                      [](const auto &a, const auto &b) {
                          return a.first < b.first;
                      });
            std::printf("%d %d:", n, k);
            for (auto &p : v) std::printf(" %d", p.second);
            std::printf("\n");
        }
    }
    return 0;
}
