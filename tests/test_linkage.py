"""SymSpell fuzzy join vs brute-force levenshtein."""

from __future__ import annotations

import pytest

from multi_sensor_data_pipeline_for_robotics__spark.operators.linkage import (
    fuzzy_match_pairs,
)

NAMES = [
    (0, "kitten"),
    (1, "sitten"),     # dist 1 from kitten
    (2, "kittens"),    # dist 1 from kitten (insertion)
    (3, "itten"),      # dist 1 from kitten (deletion), 1 from sitten
    (4, "kitten"),     # exact dup of 0
    (5, "mitten"),     # dist 1 from kitten/sitten
    (6, "banana"),     # unrelated
    (7, "bananas"),    # dist 1 from banana
    (8, "x"),          # tiny string
    (9, ""),           # empty string edge
]


def _brute(max_dist=1):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = {}
    for i, (ia, sa) in enumerate(NAMES):
        for ib, sb in NAMES[i + 1:]:
            d = lev(sa, sb)
            if d <= max_dist:
                out[(ia, ib)] = d
    return out


def test_fuzzy_match_equals_bruteforce(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_match_pairs(df, "name", "id").collect()
    }
    assert got == _brute()


def test_fuzzy_match_rejects_unsupported_distance(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    with pytest.raises(ValueError):
        fuzzy_match_pairs(df, "name", "id", max_dist=2)
