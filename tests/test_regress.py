"""Per-group OLS (plans/regress.py) — exact-line fixtures: a noiseless
y = a + b*x per group recovers (a, b, r2=1); degenerate groups yield
NULL, never a crash or a dropped row."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from multi_sensor_data_pipeline_for_robotics__spark.plans.regress import (
    grouped_ols,
    hours_since,
)


def test_recovers_exact_lines(spark):
    rows = []
    for g, (a, b) in {"g1": (2.0, 3.0), "g2": (-1.0, 0.5)}.items():
        for x in range(10):
            rows.append(Row(g=g, x=float(x), y=a + b * x))
    got = {
        r.g: r
        for r in grouped_ols(
            spark.createDataFrame(rows), ["g"], "x", "y"
        ).collect()
    }
    assert got["g1"].slope == pytest.approx(3.0, abs=1e-6)
    assert got["g1"].intercept == pytest.approx(2.0, abs=1e-6)
    assert got["g1"].r2 == pytest.approx(1.0, abs=1e-6)
    assert got["g2"].slope == pytest.approx(0.5, abs=1e-6)
    assert got["g2"].n == 10


def test_degenerate_groups_null_not_dropped(spark):
    rows = [
        Row(g="const_x", x=5.0, y=1.0),
        Row(g="const_x", x=5.0, y=2.0),
        Row(g="single", x=1.0, y=1.0),
    ]
    got = {r.g: r for r in grouped_ols(
        spark.createDataFrame(rows), ["g"], "x", "y").collect()}
    assert len(got) == 2
    assert got["const_x"].slope is None and got["const_x"].r2 is None
    assert got["single"].slope is None


def test_nulls_excluded_from_fit(spark):
    rows = [Row(g="g", x=float(i), y=float(2 * i)) for i in range(5)]
    rows += [Row(g="g", x=None, y=9.0), Row(g="g", x=1.0, y=None)]
    r = grouped_ols(spark.createDataFrame(rows), ["g"], "x", "y").collect()[0]
    assert r.n == 5
    assert r.slope == pytest.approx(2.0, abs=1e-6)


def test_hours_since_microsecond_exact(spark):
    t0 = dt.datetime(2024, 1, 1, 1, 0, 0, 500_000)  # 1h + 0.5s
    df = spark.createDataFrame([Row(ts=t0)]).select(
        hours_since("ts").alias("h")
    )
    assert df.collect()[0].h == pytest.approx(1.0 + 0.5 / 3600, abs=1e-12)
