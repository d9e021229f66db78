"""Round-2 analytics extensions: sketch error bounds, debounce
semantics, exact group percentiles."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.plans import analytics as A
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table


def test_approx_distinct_within_declared_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r
        for r in A.approx_distinct_stats(ev, rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    for etype, n_exact in exact.items():
        est = approx[etype]["approx_users"]
        # HLL++ rsd=0.02 -> 5 sigma slack; deterministic data, so this
        # is a regression pin, not a flaky statistical assertion
        assert abs(est - n_exact) / n_exact < 0.10, (etype, est, n_exact)
    # approx median must land inside the group's value range
    ranges = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for etype, (lo, hi) in ranges.items():
        assert lo <= approx[etype]["approx_median"] <= hi


def test_debounce_keeps_first_per_window(spark):
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        # user 1, one burst: 3 clicks in 10s -> keep first, suppress 2
        (1, 1, "click", t0),
        (2, 1, "click", t0 + dt.timedelta(seconds=5)),
        (3, 1, "click", t0 + dt.timedelta(seconds=10)),
        # same user, next window -> kept
        (4, 1, "click", t0 + dt.timedelta(minutes=6)),
        # different type inside the first window -> its own group
        (5, 1, "view", t0 + dt.timedelta(seconds=2)),
        # different user -> its own group
        (6, 2, "click", t0 + dt.timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(
        [(i, u, ty, ts) for i, u, ty, ts in rows],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    got = {
        (r.user_id, r.event_type, r.first_event_id): r.n_suppressed
        for r in A.debounce_events(df, window_ms=300_000).collect()
    }
    assert got == {
        (1, "click", 1): 2,
        (1, "click", 4): 0,
        (1, "view", 5): 0,
        (2, "click", 6): 0,
    }


def test_group_percentiles_linear_interpolation(spark):
    # 4 values -> p50 = linear interpolation between 2nd and 3rd
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)],
        "event_type string, value double",
    )
    r = A.group_percentiles(df, probs=(0.5, 0.75)).collect()[0]
    assert r["p50"] == pytest.approx(2.5)
    assert r["p75"] == pytest.approx(3.25)
    assert r["n"] == 4
