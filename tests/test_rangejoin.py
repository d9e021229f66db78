"""interval_join must be value-identical to the naive non-equi join,
including boundary timestamps and intervals longer than the bucket."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _fixture(spark):
    events = spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate([0, 5, 10, 29, 30, 31, 60, 90, 120, 200])],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(0), _ts(30)),      # boundary hits at both ends
            (101, _ts(30), _ts(30)),     # zero-length interval
            (102, _ts(25), _ts(130)),    # spans many buckets (> bucket width)
            (103, _ts(500), _ts(600)),   # matches nothing
        ],
        "iv_id long, lo timestamp, hi timestamp",
    )
    return events, intervals


def _pairs(df):
    return {(r["event_id"], r["iv_id"]) for r in df.collect()}


def test_interval_join_matches_naive(spark):
    events, intervals = _fixture(spark)
    naive = events.join(
        intervals, (F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi"))
    )
    for bucket_ms in [1_000, 10_000, 60_000, None]:
        got = interval_join(events, intervals, bucket_ms=bucket_ms)
        assert _pairs(got) == _pairs(naive), f"bucket_ms={bucket_ms}"


def test_interval_join_no_nested_loop(spark):
    events, intervals = _fixture(spark)
    plan = (
        interval_join(events, intervals, bucket_ms=10_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_rejects_outer(spark):
    events, intervals = _fixture(spark)
    import pytest
    with pytest.raises(ValueError):
        interval_join(events, intervals, how="left")
