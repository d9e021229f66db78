"""Focused regression tests for the r13 optimization round's internal
changes: the explode_outer shingle path, the broadcast-quantile clamp,
and map_events' SQL-literal escaping. Each pins behavior an
optimization could silently have changed."""

import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators import dedup as D
from multi_sensor_data_pipeline_for_robotics__spark.operators.clean import (
    clamp_outliers,
)


def test_ngram_jaccard_short_and_null_docs(spark):
    # explode_outer emits a null-shingle row for docs with < n tokens /
    # NULL text; those rows must die in the join, not produce pairs or
    # corrupt counts (r13: explode -> explode_outer)
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),
            (3, "xx"),          # < n tokens -> empty shingle set
            (4, None),           # NULL text -> empty shingle set
            (5, "p q r s t"),
        ],
        "doc_id long, text string",
    )
    rows = D.ngram_jaccard_pairs(
        df, n=3, threshold=0.5, max_shingle_df=None
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


def test_ngram_jaccard_all_docs_too_short(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, text string"
    )
    assert (
        D.ngram_jaccard_pairs(df, n=3, threshold=0.1, max_shingle_df=None).count()
        == 0
    )


def test_clamp_outliers_all_null_column_skips(spark):
    # the broadcast-quantile form must reproduce the scalar path's
    # "nothing to clamp" branch: a NULL quantile array keeps every
    # value (including NULLs) unchanged
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, None, 1000.0), (3, None, -7.0)],
        "id long, dead double, v double",
    )
    out = clamp_outliers(df, ["dead", "v"]).orderBy("id").collect()
    assert [r["dead"] for r in out] == [None, None, None]
    # v: median of (5, 1000, -7) = 5; 1% / 99% exact percentiles clamp
    # the extremes on a 3-row column to interpolated fences
    assert {r["id"] for r in out} == {1, 2, 3}
    assert out[0]["v"] == pytest.approx(5.0)


def test_clamp_outliers_matches_scalar_semantics(spark):
    vals = [float(x) for x in range(1, 101)] + [10_000.0, -10_000.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    row = df.agg(
        F.percentile("v", F.array(F.lit(0.01), F.lit(0.5), F.lit(0.99)))
    ).first()[0]
    q_lo, med, q_hi = row
    expect = {
        i: (med if (v < q_lo or v > q_hi) else v) for i, v in enumerate(vals)
    }
    got = {r["id"]: r["v"] for r in clamp_outliers(df, ["v"]).collect()}
    assert got == expect


def test_map_events_quoted_type_literal(spark):
    # the one-hot pivot now builds SQL string literals; a type value
    # containing a quote (or backslash) must be escaped, not break the
    # parse or match the wrong rows
    import datetime as dt

    from multi_sensor_data_pipeline_for_robotics__spark.operators.sync import (
        map_events,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    log = spark.createDataFrame(
        [(t0, "o'brien"), (t0, "back\\slash"), (t0, "plain")],
        "timestamp timestamp, event_type string",
    )
    out = map_events(
        log,
        t0,
        t0 + dt.timedelta(minutes=1),
        step_ms=60_000,
        tolerance_ms=120_000,
        event_types=["o'brien", "back\\slash", "plain", "absent"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["event_o'brien"] == 1
    assert r["event_back\\slash"] == 1
    assert r["event_plain"] == 1
    assert r["event_absent"] == 0
