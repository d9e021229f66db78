"""TIMESTAMP_NTZ hardening: driver test data has shipped ``ts`` both as
int64 nanos and as parquet µs with ``isAdjustedToUTC=false`` (Spark reads
the latter as TIMESTAMP_NTZ). These tests write an NTZ parquet fixture
and prove the load path normalizes it and the sync family (o14-o17
shapes) runs end-to-end on it — the round-3 regression scenario."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from multi_sensor_data_pipeline_for_robotics__spark.functions.timeutil import ts_us
from multi_sensor_data_pipeline_for_robotics__spark.operators.sync import synchronize
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table
from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
    read_events_stream,
    run_to_memory,
    windowed_sensor_align,
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def ntz_dir(tmp_path_factory):
    """events.parquet with ts as µs isAdjustedToUTC=false (NTZ)."""
    d = tmp_path_factory.mktemp("ntz")
    n = 300
    types = ["click", "view", "error"]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [BASE + dt.timedelta(seconds=7 * i) for i in range(n)],
                pa.timestamp("us"),  # no tz => isAdjustedToUTC=false
            ),
            "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
            "event_type": pa.array([types[i % 3] for i in range(n)]),
            "value": pa.array([float(i) for i in range(n)]),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_load_table_normalizes_ntz(spark, ntz_dir):
    df = load_table(spark, ntz_dir, "events")
    t = df.schema["ts"].dataType
    assert isinstance(t, T.TimestampType) and not isinstance(t, T.TimestampNTZType)
    # UTC session => values unchanged by the cast
    first = df.orderBy("event_id").first()
    assert first["ts"].replace(tzinfo=None) == BASE


def test_ts_us_accepts_raw_ntz_column(spark):
    df = spark.range(3).select(
        F.lit(BASE).cast("timestamp_ntz").alias("t"), F.col("id")
    )
    assert isinstance(df.schema["t"].dataType, T.TimestampNTZType)
    us = df.select(ts_us(F.col("t")).alias("us")).first()["us"]
    assert us == int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_synchronize_runs_on_ntz_origin(spark, ntz_dir):
    """The o14/o15/o16/o17 shapes over NTZ-encoded parquet — the exact
    plan that threw DATATYPE_MISMATCH in round 3."""
    ev = load_table(spark, ntz_dir, "events")
    cam = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("ts").alias("timestamp"))
        .agg(F.max("value").alias("x"))
    )
    mot = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.col("ts").alias("timestamp"))
        .agg(F.max("value").alias("y"))
    )
    log = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("timestamp"), "event_type"
    )
    res = synchronize(
        cam, mot, log, method="pad", step_ms=60_000, tolerance_ms=120_000,
        event_types=["error"],
    )
    assert res.df is not None
    rows = res.df.count()
    assert rows > 0
    # grid spans the overlap window at 1-min steps
    assert {"timestamp", "camera_x", "motion_y", "event_error"} <= set(
        res.df.columns
    )


def test_ntz_columns_keep_predicate_pushdown(spark, ntz_dir):
    """Timestamp filters must reach the parquet scan. A post-scan
    NTZ->TIMESTAMP cast wraps the scan in a Project and silently turns
    every ts predicate into a full scan (the round-4 bench regression);
    reading NTZ as TIMESTAMP at the scan keeps PushedFilters intact."""
    df = load_table(spark, ntz_dir, "events").filter(
        F.col("ts") >= F.lit(BASE + dt.timedelta(minutes=5))
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan


def test_streaming_reader_handles_ntz(spark, ntz_dir):
    """The round-3 streaming bug: a stale int64 schema read µs values as
    ns and produced 1970 timestamps. The footer-derived schema must
    yield real event times."""
    stream = read_events_stream(spark, ntz_dir).filter(
        F.col("event_type") == "click"
    )
    aligned = windowed_sensor_align(stream, step_ms=60_000, ts_col="ts")
    spark.catalog.dropTempView("ntz_stream_tbl") if spark.catalog.tableExists(
        "ntz_stream_tbl"
    ) else None
    run_to_memory(aligned, "ntz_stream_tbl", output_mode="complete")
    out = spark.table("ntz_stream_tbl")
    years = [r["y"] for r in out.select(F.year("timestamp").alias("y")).distinct().collect()]
    assert years == [2024]
    assert out.count() > 1
