"""Exactness of the two-level simhash banding (round 7).

`_simhash_value_pairs` claims a double pigeonhole: any fingerprint pair
within hamming SIMHASH_MAX_HAMMING (3) of each other (a) matches at
least one of the 4 level-1 bands, and (b) within that band's complement
matches at least one of the 4 level-2 sub-bands — so joining on the
packed (band, sub-band) key finds EVERY qualifying pair, never a subset.

The fixture-driven oracle checks can't target the hard case (diffs
placed to defeat as many band/sub-band matches as possible), so this
test constructs it directly: for a set of seeds, plant neighbors at
every adversarial 3-bit placement pattern — all three diffs in distinct
level-1 bands, all three in one band, straddling sub-band boundaries
within a band's complement — plus seeded-random values, and compare the
banded result against a brute-force cross join on the same frame.
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from codegraphdb_spark.queries.text import (
    SIMHASH_MAX_HAMMING,
    SIMHASH_PAIR_BITS,
    _simhash_value_pairs,
)

MASK60 = (1 << SIMHASH_PAIR_BITS) - 1


def _brute_pairs(values: list[int]) -> set[tuple[int, int, int]]:
    out = set()
    for a, b in itertools.combinations(sorted(set(values)), 2):
        h = bin(a ^ b).count("1")
        if h <= SIMHASH_MAX_HAMMING:
            out.add((a, b, h))
    return out


def _adversarial_values() -> list[int]:
    rng = random.Random(42)
    values: list[int] = []
    seeds = [rng.getrandbits(SIMHASH_PAIR_BITS) for _ in range(6)]
    # bit-position triples that stress both pigeonhole levels: one diff
    # per distinct level-1 band (bands are 15-bit chunks), all diffs in
    # one band, and complement positions that straddle the 12/11/11/11
    # sub-band boundaries (offsets 12, 23, 34 of the packed complement)
    triples = [
        (0, 15, 30), (15, 30, 45), (0, 30, 45),      # 3 distinct bands
        (0, 1, 2), (15, 16, 17), (45, 58, 59),       # all in one band
        (11, 12, 13), (22, 23, 24), (33, 34, 35),    # sub-band seams
        (14, 29, 44), (0, 29, 59), (11, 23, 35),
    ]
    for s in seeds:
        values.append(s)
        for t in triples:
            v = s
            for bit in t:
                v ^= 1 << bit
            values.append(v & MASK60)
        # 1- and 2-bit neighbors at random positions
        for _ in range(8):
            v = s
            for bit in rng.sample(range(SIMHASH_PAIR_BITS), rng.choice([1, 2])):
                v ^= 1 << bit
            values.append(v & MASK60)
    # background noise: random values (mostly far from everything)
    values += [rng.getrandbits(SIMHASH_PAIR_BITS) for _ in range(200)]
    return values


def test_two_level_banding_equals_brute_force(spark):
    values = _adversarial_values()
    vals = spark.createDataFrame(
        [(v,) for v in sorted(set(values))], "simhash BIGINT"
    )
    got = {
        (r["sim_a"], r["sim_b"], r["hamming"])
        for r in _simhash_value_pairs(vals).collect()
    }
    want = _brute_pairs(values)
    assert got == want
    # the adversarial placements must actually produce hamming-3 pairs
    # (a vacuous fixture would prove nothing)
    assert sum(1 for (_, _, h) in want if h == SIMHASH_MAX_HAMMING) >= 60


def test_banding_emits_no_false_positives_unverified(spark):
    """Every emitted pair carries its true hamming distance (the verify
    step is part of the operator, not the caller's job)."""
    rng = random.Random(7)
    values = [rng.getrandbits(SIMHASH_PAIR_BITS) for _ in range(300)]
    vals = spark.createDataFrame(
        [(v,) for v in sorted(set(values))], "simhash BIGINT"
    )
    for r in _simhash_value_pairs(vals).collect():
        assert bin(r["sim_a"] ^ r["sim_b"]).count("1") == r["hamming"]
        assert r["hamming"] <= SIMHASH_MAX_HAMMING
