"""siv::PerlinNoise bit-exactness (golden: tests/golden/refperlin_golden.cpp,
compiled against the reference's own vendored header)."""

import os
import struct

import numpy as np

from megaverse_tpu.utils.refperlin import SivPerlin

GOLD = os.path.join(os.path.dirname(__file__), "golden", "refperlin_golden.txt")


def _parse():
    out = {}
    with open(GOLD) as f:
        for line in f:
            _, seed, kind, *vals = line.replace(":", "").split()
            out[(int(seed), kind)] = vals
    return out


def test_siv_perlin_bit_exact():
    gold = _parse()
    for seed in (0, 1, 42, 999999999):
        p = SivPerlin(seed)
        np.testing.assert_array_equal(
            p.p[:16], [int(v) for v in gold[(seed, "perm")]])
        xs = np.array([0.3, 1.7, 13.49, 200.0, -3.2])
        got = p.noise2d(xs, 0.77 * xs + 1.0)
        exp = [float.fromhex(v) for v in gold[(seed, "noise")]]
        np.testing.assert_array_equal(got, exp)  # bit-exact f64
        fx = 42.0 / 3.7
        acc = [float(p.accumulated_octave_2d_0_1(7 / fx, 11 / fx, o))
               for o in (1, 3, 9)]
        np.testing.assert_array_equal(
            acc, [float.fromhex(v) for v in gold[(seed, "acc")]])
