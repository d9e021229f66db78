"""Distributed interval (range) join: match point events to containing
time intervals WITHOUT a nested-loop join.

Spark has no native range-join physical operator (Databricks' range-join
hint is proprietary); the naive `a.join(b, a.ts BETWEEN b.lo AND b.hi)`
plans as BroadcastNestedLoopJoin — O(|A|·|B|) and broadcast-bound. The
standard scalable plan, used here:

  1. choose a bucket width >= the longest interval (or take it as a
     parameter when known a priori, e.g. "sessions are <= 30 min");
  2. explode each interval into the buckets it overlaps (<= 2 buckets
     when width >= interval length);
  3. equi-join events to interval-buckets on the bucket id — a plain
     shuffle/broadcast hash join Catalyst already optimizes;
  4. filter exact containment. A point event lives in exactly ONE
     bucket, so each (event, interval) pair meets at most once — no
     dedup pass needed.

Cost: O(|events| + Σ interval_buckets) shuffle rows + hash-join — the
bucket id is the partition key, so co-located and skew-splittable by
AQE. Degenerates gracefully: one giant interval -> one hot bucket ->
AQE skew split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.functions.timeutil import ts_us


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bucket_ms: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each event to every interval containing it
    (``lo <= ts <= hi``), via the bucketized equi-join plan above.

    ``bucket_ms``: bucket width; when None, one tiny agg job measures
    the longest interval. Output: all event columns + all interval
    columns (names must not collide, except none are shared).
    """
    if how != "inner":
        # outer variants would need the containment predicate inside the
        # join condition (the post-filter drops null-extended rows)
        raise ValueError("interval_join supports how='inner' only")
    if bucket_ms is None:
        row = intervals.agg(
            F.max(ts_us(F.col(hi)) - ts_us(F.col(lo))).alias("m")
        ).first()
        bucket_us = max(int(row["m"] or 0), 1)
    else:
        bucket_us = bucket_ms * 1000
    # integral `div`, never float division: µs-since-epoch (~1.7e18)
    # exceeds double's 2^53 exact range, and a boundary off by one µs
    # would drop join rows. Monotone truncation keeps lo_b <= ev_b <=
    # hi_b for any contained event, which is all the prefilter needs.
    ev_bucket = F.expr(f"unix_micros(cast({event_ts} as timestamp)) div {bucket_us}")
    iv_lo_b = F.expr(f"unix_micros(cast({lo} as timestamp)) div {bucket_us}")
    iv_hi_b = F.expr(f"unix_micros(cast({hi} as timestamp)) div {bucket_us}")

    iv = intervals.withColumn(
        "__b", F.explode(F.sequence(iv_lo_b, iv_hi_b))
    )
    ev = events.withColumn("__b", ev_bucket)
    joined = ev.join(iv, "__b", how).filter(
        (F.col(event_ts) >= F.col(lo)) & (F.col(event_ts) <= F.col(hi))
    )
    return joined.drop("__b")
