"""Sequence pattern matching (operators/sequence.py) — hand-built
event streams where the matches are enumerable: contiguity in the
filtered stream, gap limits, overlap semantics, tiebreak totality."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from multi_sensor_data_pipeline_for_robotics__spark.operators.sequence import (
    match_sequence,
)


def _ev(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                u=u,
                ts=t0 + dt.timedelta(seconds=s),
                et=et,
                eid=i,
            )
            for i, (u, s, et) in enumerate(rows)
        ]
    )


def _match(spark, rows, pattern, gap_ms):
    return sorted(
        (r.key, r.duration_ms)
        for r in match_sequence(
            _ev(spark, rows), "u", "ts", "et", pattern, gap_ms,
            tiebreak_col="eid",
        ).collect()
    )


def test_simple_match_and_duration(spark):
    rows = [("u1", 0, "A"), ("u1", 10, "B"), ("u1", 25, "C")]
    got = _match(spark, rows, ["A", "B", "C"], gap_ms=20_000)
    assert got == [("u1", 25_000)]


def test_gap_limit_blocks_match(spark):
    rows = [("u1", 0, "A"), ("u1", 10, "B"), ("u1", 40, "C")]
    # B->C gap 30s > 20s limit
    assert _match(spark, rows, ["A", "B", "C"], gap_ms=20_000) == []


def test_non_pattern_events_invisible_pattern_events_break(spark):
    # X between A and B is invisible (not in pattern); an extra A
    # between A and B IS visible and breaks contiguity for the first A
    rows = [
        ("u1", 0, "A"), ("u1", 5, "X"), ("u1", 10, "B"),
        ("u2", 0, "A"), ("u2", 5, "A"), ("u2", 10, "B"),
    ]
    got = _match(spark, rows, ["A", "B"], gap_ms=60_000)
    # u1: A(0)->B(10) matches. u2: only A(5)->B(10) matches (A(0)'s
    # next filtered event is A(5), not B)
    assert got == [("u1", 10_000), ("u2", 5_000)]


def test_overlapping_occurrences_all_emitted(spark):
    rows = [("u1", 0, "A"), ("u1", 5, "B"), ("u1", 10, "A"), ("u1", 15, "B")]
    got = _match(spark, rows, ["A", "B"], gap_ms=60_000)
    assert got == [("u1", 5_000), ("u1", 5_000)]


def test_matches_confined_to_key(spark):
    rows = [("u1", 0, "A"), ("u2", 5, "B")]
    assert _match(spark, rows, ["A", "B"], gap_ms=60_000) == []


def test_pattern_too_short_raises(spark):
    with pytest.raises(ValueError):
        match_sequence(_ev(spark, []), "u", "ts", "et", ["A"], 1000)
