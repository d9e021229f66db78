"""Stream-stream attribution join == batch time-range self-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table
from multi_sensor_data_pipeline_for_robotics__spark.streaming.join_stream import (
    attribute_stream,
)
from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
    read_events_stream,
    run_to_memory,
)


def _batch_twin(spark, sf_dir, lookback_minutes=10):
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("left_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("rkey"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
    )
    cond = (
        (F.col("key") == F.col("rkey"))
        & (
            F.col("right_ts")
            >= F.col("left_ts") - F.expr(f"INTERVAL {lookback_minutes} MINUTES")
        )
        & (F.col("right_ts") <= F.col("left_ts"))
    )
    return p.join(c, cond).select(
        "key", "left_id", "left_ts", "right_id", "right_ts"
    )


def test_stream_join_matches_batch(spark, sf_dir):
    joined = attribute_stream(
        read_events_stream(spark, sf_dir),
        read_events_stream(spark, sf_dir),
        lookback_minutes=10,
    )
    run_to_memory(joined, "t_stream_attrib", output_mode="append")
    got = sorted(map(tuple, spark.table("t_stream_attrib").collect()))
    want = sorted(map(tuple, _batch_twin(spark, sf_dir).collect()))
    assert got == want and len(want) > 0


def test_stream_join_is_streaming_with_watermarks(spark, sf_dir):
    joined = attribute_stream(
        read_events_stream(spark, sf_dir), read_events_stream(spark, sf_dir)
    )
    assert joined.isStreaming
    # both sides must carry event-time watermarks or state grows forever
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
