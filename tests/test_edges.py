"""Edge fixtures from SURVEY §5.2: duplicate timestamps, single-row
inputs, unsorted input, all-NULL columns, empty frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators import clean as C
from multi_sensor_data_pipeline_for_robotics__spark.operators import sync as S

T0 = dt.datetime(2024, 1, 1)


def _ts(ms):
    return T0 + dt.timedelta(milliseconds=ms)


def test_asof_duplicate_timestamps_deterministic(spark):
    # two observations at the same ts: pad/backfill must still return
    # ONE row per grid point (the window fill picks the last-ordered
    # duplicate; what matters is determinism and cardinality)
    sensor = spark.createDataFrame(
        [(_ts(0), 1.0), (_ts(100), 2.0), (_ts(100), 2.0), (_ts(200), 3.0)],
        "timestamp timestamp, x double",
    )
    grid = S.time_grid(spark, T0, _ts(200), 100)
    for method in ["pad", "backfill", "nearest"]:
        out = S.asof_align(grid, sensor, method=method)
        rows = {r["timestamp"]: r["x"] for r in out.collect()}
        assert len(rows) == 3
        assert rows[_ts(100)] == 2.0


def test_asof_single_observation(spark):
    sensor = spark.createDataFrame([(_ts(100), 5.0)], "timestamp timestamp, x double")
    grid = S.time_grid(spark, T0, _ts(200), 100)
    pad = {r["timestamp"]: r["x"] for r in S.asof_align(grid, sensor, method="pad").collect()}
    assert pad[_ts(0)] is None and pad[_ts(100)] == 5.0 and pad[_ts(200)] == 5.0
    bf = {r["timestamp"]: r["x"] for r in S.asof_align(grid, sensor, method="backfill").collect()}
    assert bf[_ts(0)] == 5.0 and bf[_ts(100)] == 5.0 and bf[_ts(200)] is None
    nr = {r["timestamp"]: r["x"] for r in S.asof_align(grid, sensor, method="nearest").collect()}
    assert nr == {_ts(0): 5.0, _ts(100): 5.0, _ts(200): 5.0}


def test_asof_unsorted_input(spark):
    # as-of align must not depend on input order (reference guarantees
    # sortedness via O11; the Spark op orders inside the window itself)
    rows = [(_ts(ms), float(ms)) for ms in [300, 0, 200, 100]]
    sensor = spark.createDataFrame(rows, "timestamp timestamp, x double")
    grid = S.time_grid(spark, T0, _ts(300), 100)
    out = {r["timestamp"]: r["x"] for r in S.asof_align(grid, sensor, method="pad").collect()}
    assert out == {_ts(0): 0.0, _ts(100): 100.0, _ts(200): 200.0, _ts(300): 300.0}


def test_clean_all_null_column_drops_everything(spark):
    df = spark.createDataFrame(
        [(_ts(0), None), (_ts(1), None)], "timestamp timestamp, x double"
    )
    res = C.clean(df, "camera")
    assert res.df.count() == 0
    assert any("rows_with_missing=2" in line for line in res.report)


def test_sentinel_filter_empty_frame(spark):
    df = spark.createDataFrame([], "timestamp timestamp, x double")
    assert C.sentinel_filter(df).count() == 0
    assert C.clamp_outliers(df, ["x"]).count() == 0


def test_synchronize_missing_input_reports_error(spark):
    mot = spark.createDataFrame([(_ts(0), 1.0)], "timestamp timestamp, y double")
    res = S.synchronize(None, mot)
    assert res.df is None and "error" in res.report[0]


def test_map_events_all_outside_tolerance(spark):
    log = spark.createDataFrame(
        [(_ts(450), "E")], "timestamp timestamp, event_type string"
    )
    out = S.map_events(log, T0, _ts(200), step_ms=100, tolerance_ms=50,
                       event_types=["E"])
    # nearest grid point of 450ms clamps to 200ms -> |dt|=250ms >= tol
    assert out.count() == 0
