"""libstdc++ std::sort (introsort) permutation parity.

Golden permutations from tests/golden/refsort_golden.cpp (g++ 12 libstdc++):
(key, index) pairs compared by key only — frequent ties pin the unstable
order across the insertion-threshold, quicksort, and heapsort-fallback
regimes. Needed for reference-stream Collect layouts (PARITY.md #8), whose
peak-reward cells come from an unstable sort-by-height
(scenario_collect.cpp:124-132)."""

import os

from megaverse_tpu.utils.refrng import MT19937
from megaverse_tpu.utils.refsort import std_sort

GOLD = os.path.join(os.path.dirname(__file__), "golden", "refsort_golden.txt")


def test_std_sort_matches_libstdcxx_golden():
    rng = MT19937(12345)
    with open(GOLD) as f:
        lines = [l.split(":") for l in f.read().strip().split("\n")]
    for head, perm in lines:
        n, k = map(int, head.split())
        expect = list(map(int, perm.split()))
        v = [(rng.next_u32() % k, i) for i in range(n)]
        std_sort(v, lambda a, b: a[0] < b[0])
        assert [p[1] for p in v] == expect, (n, k)
        # and it actually sorts
        keys = [p[0] for p in v]
        assert keys == sorted(keys)
