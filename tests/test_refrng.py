"""Reference-stream RNG parity: megaverse_tpu/utils/refrng.py vs real
libstdc++ <random> golden vectors.

Goldens were produced by tests/golden/refrng_golden.cpp compiled with the
in-container g++ 12 (libstdc++ of GCC >= 11: Lemire downscaling in
uniform_int_distribution). They pin the exact primitives the reference
engine's layout generation consumes: mt19937 words, randRange
(uniform_int_distribution<int>), frand (uniform_real_distribution<float>),
std::shuffle, and the master->env->episode seed chain."""

import numpy as np

from megaverse_tpu.utils.refrng import (
    MT19937,
    Rng,
    episode_reseed,
    fan_out_env_seeds,
)

RAW42 = [1608637542, 3421126067, 4083286876, 787846414, 3143890026,
         3348747335, 2571218620, 2563451924]
RAWDEF = [3499211612, 581869302, 3890346734, 3586334585]
RAW42_1500 = [502073266, 1853399237, 4036548229, 1429432898]
RR123 = [1, 7, 5, -1, 226851, 21, 1, 7, 6, 0, 423106, 23, 1, 4, 6, 1,
         480931, 5, 0, 4, 5, 1, 729049, 11]
FR7 = [0.0763082877, 0.227339074, 0.77991879, 0.31897223, 0.438409239,
       0.978222907, 0.723465204, 0.455584913, 0.977989495, 0.308012754,
       0.538495898, 0.263870835]
SH7 = [0, 2, 5, 1, 4, 3, 6]
SH8 = [6, 7, 2, 4, 5, 1, 0, 3]
SH100_HEAD = [22, 3, 2, 23, 96, 58, 1, 35, 16, 94, 39, 15, 67, 40, 66, 63]
AFTER_SH = 618620
ENVSEEDS42 = [402159385, 855281516, 1020821719, 196961603, 785972506,
              837186833, 642804655, 640862981]
EPSEEDS = [81935403, 966381625, 1028493808, 131770126]
EP_AFTER = 509


def test_mt19937_raw_words():
    rng = MT19937(42)
    assert [rng.next_u32() for _ in range(8)] == RAW42
    d = MT19937()
    assert [d.next_u32() for _ in range(4)] == RAWDEF
    big = MT19937(42)
    for _ in range(1500):
        big.next_u32()
    assert [big.next_u32() for _ in range(4)] == RAW42_1500


def test_rand_range_stream():
    rng = Rng(123)
    los = [0, 0, 5, -3, 0, 2]
    his = [2, 10, 7, 4, 1000000, 30]
    got = [rng.rand_range(los[k % 6], his[k % 6]) for k in range(24)]
    assert got == RR123


def test_frand_stream():
    rng = Rng(7)
    got = np.asarray([rng.frand() for _ in range(12)], np.float32)
    np.testing.assert_array_equal(got, np.asarray(FR7, np.float32))


def test_shuffle_matches_libstdcxx():
    rng = Rng(99)
    v7 = list(range(7))
    rng.shuffle(v7)
    assert v7 == SH7
    v8 = list(range(8))
    rng.shuffle(v8)
    assert v8 == SH8
    v100 = list(range(100))
    rng.shuffle(v100)
    assert v100[:16] == SH100_HEAD
    # stream position after all shuffles is exact too
    assert rng.rand_range(0, 1000000) == AFTER_SH


def test_seed_chain():
    assert fan_out_env_seeds(42, 8) == ENVSEEDS42
    env = Rng(7)
    seeds = [episode_reseed(env) for _ in range(4)]
    assert seeds == EPSEEDS
    assert env.rand_range(0, 1000) == EP_AFTER
